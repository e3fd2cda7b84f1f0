package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: cold-JVM wall time of one SparkEntry query (the bench's
  * first-run shape — generated-class compilation included). Run in a FRESH
  * JVM per measurement:
  * `SPARK_GRAFT_CPUS=N java -cp ... graft.tools.ColdProbe <query> [sfDir]`. */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_curate_assign")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[cold-probe] $name $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      graft.engine.Caches.releaseAll()
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_SHOW"))
      fn(spark, sfDir).show(100, truncate = false)
    run("cold")
    run("warm1")
    run("warm2")
    spark.stop()
  }
}
