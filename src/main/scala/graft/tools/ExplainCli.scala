package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints row counts and the physical plan of a named SparkEntry query —
  * the `.explain` feedback loop for plan-shape tuning at scale.
  * Usage: ExplainCli <sfDir> [queryName] */
object ExplainCli {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).headOption match {
      case Some(q) =>
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        println(s"$q rows=${df.count()}")
        df.explain("formatted")
      case None =>
        val e = graft.SparkEntry.entry(spark)
        println("entry rows=" + e.count() + " valid=" + e.where("valid").count())
        e.explain("simple")
    }
    spark.stop()
  }
}
