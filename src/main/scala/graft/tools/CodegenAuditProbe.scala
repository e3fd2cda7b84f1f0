package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: per-query audit of generated-method sizes across every
  * SparkEntry query — lists whole-stage-codegen stages whose best method
  * exceeds HotSpot's 8000-bytecode JIT threshold (those stages now run the
  * un-fused fallback under spark.sql.codegen.hugeMethodLimit=8000; each is
  * a candidate for restructuring back under the limit). */
object CodegenAuditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // audit the FUSED shapes: keep the default hugeMethodLimit here so
      // codegen stats reflect what fusion would generate (not the
      // fallback), and disable AQE so WholeStageCodegen nodes exist in the
      // static plan (adaptive plans defer them past what codegenToSeq sees)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.debug._
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val sizes = df.queryExecution.debug.codegenToSeq()
          .map(_._3.maxMethodCodeSize).filter(_ > 0)
        val over = sizes.filter(_ > 8000)
        if (over.nonEmpty)
          println(s"[codegen-audit] $name OVER: ${over.mkString(",")} " +
            s"(all: ${sizes.sorted.reverse.take(5).mkString(",")})")
        else if (sizes.nonEmpty && sizes.max > 6000)
          println(s"[codegen-audit] $name near-limit: max ${sizes.max}")
      } catch { case e: Throwable =>
        println(s"[codegen-audit] $name SKIP: ${e.getClass.getSimpleName}")
      }
      graft.engine.Caches.releaseAll()
    }
    spark.stop()
  }
}
