package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-internal caches must be tracked and releasable: a long-lived
  * session invoking LSH operators repeatedly would otherwise accumulate
  * MEMORY_AND_DISK blocks until context shutdown. */
class CachesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("operator-internal persists are tracked and released on demand") {
    import spark.implicits._
    Caches.releaseAll()
    assert(Caches.trackedCount === 0)
    val docs = (0L until 40L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta token$i"))
      .toDF("doc_id", "text")
    Dedup.minhashPairs(docs, "doc_id", "text").count()
    assert(Caches.trackedCount > 0, "minhashPairs should register its internal caches")
    Dedup.simhashPairs(docs, "doc_id", "text").count()
    Pipeline.packChunks(docs, "doc_id", "text", budget = 64).count()
    val tracked = Caches.trackedCount
    assert(tracked >= 3)
    Caches.releaseAll()
    assert(Caches.trackedCount === 0)
    // idempotent; a released registry stays empty until the next operator
    Caches.releaseAll()
    assert(Caches.trackedCount === 0)
  }
}
