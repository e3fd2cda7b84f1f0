package graft

import org.apache.spark.sql.DataFrame

package object engine {
  /** `df.persistTracked()` — persist MEMORY_AND_DISK and register with
    * [[graft.engine.Caches]] so operator-internal caches can be released
    * by long-lived sessions (see Caches' scaladoc). */
  private[graft] implicit final class TrackedPersist(private val df: DataFrame)
      extends AnyVal {
    def persistTracked(): DataFrame = Caches.persistTracked(df)
  }
}
