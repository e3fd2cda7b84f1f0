package graft.tools
import graft.engine.SchemaInfer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: where does q_infer_drift's time go? */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val ref = li.where(col("l_orderkey") % 2 === 0)
    val cur = li.where(col("l_orderkey") % 2 === 1)
      .withColumn("l_quantity", when(col("l_orderkey") % 7 === 1, col("l_quantity") + 0.5).otherwise(col("l_quantity")))
      .withColumn("l_returnflag", when(col("l_orderkey") % 11 === 1, lit("Z")).otherwise(col("l_returnflag")))
      .withColumn("l_extendedprice", when(col("l_orderkey") % 13 === 1, -col("l_extendedprice")).otherwise(col("l_extendedprice")))
      .withColumn("l_shipdate", when(col("l_orderkey") % 17 === 1, lit(null).cast("timestamp")).otherwise(col("l_shipdate")))
    def t(name: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[driftprobe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    t("evidence(full)") { SchemaInfer.evidence(li).collect() }
    t("evidence(ref-half)") { SchemaInfer.evidence(ref).collect() }
    t("evidence(cur-mutated)") { SchemaInfer.evidence(cur).collect() }
    t("full-drift") { SchemaInfer.evidenceDiff(SchemaInfer.evidence(ref), SchemaInfer.evidence(cur)).collect() }
    t("full-drift-paired") { SchemaInfer.evidenceDiffPaired(ref, cur).collect() }
    spark.stop()
  }
}
