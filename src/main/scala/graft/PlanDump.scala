package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Optimization-round measurement tool (guide §1.1/§7.2): dump
  * `explain("formatted")` for every declared query (or a filtered subset) to
  * one file per query, so plan shapes (Exchange count, join strategy,
  * PushedFilters/ReadSchema, WholeStageCodegen spans) can be diffed across
  * optimization rounds. Writes `<outDir>/<query>_<tag>.txt`.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> [q43,q100,...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = if (args.length > 1) args(1) else "before"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.mat.multi-use",
        sys.env.getOrElse("SPARK_GRAFT_MAT_MULTI_USE", "none"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"[plandump] $name ok")
      } catch {
        case e: Throwable => println(s"[plandump] $name FAILED: $e")
      } finally SparkEntry.releaseScratch(spark)
    }
    spark.stop()
  }
}
