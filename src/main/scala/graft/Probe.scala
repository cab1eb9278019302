package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round A/B harness (guide §1): times named experimental
  * variants of hot queries against the declared implementations, same
  * methodology as Bench (noop sink, warmup, median of N, gc + scratch sweep
  * between samples). NOT part of the driver contract; variants that win are
  * promoted into the declared query (after oracle re-verification) and
  * variants that lose are recorded in OPTIMIZATION_r18.md.
  *
  * Usage: jrun.sh graft.Probe <name1,name2,...> [reps]
  */
object Probe {

  // ------------------------------------------------------------ variants
  // Concluded experiments are recorded in OPTIMIZATION_r18.md with their
  // measurements; only live ones stay here.

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43v0" -> graft.queries.Dedup.q43 _,
    "q82v0" -> graft.queries.Dedup.q82 _)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim)
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", sys.env.getOrElse("SPARK_UI", "false"))
      .config("spark.graft.mat.multi-use",
        sys.env.getOrElse("SPARK_GRAFT_MAT_MULTI_USE", "cache"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val ok = try {
        variants(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable => println(s"[probe] $name ERROR $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      SparkEntry.releaseScratch(spark)
      if (ok) dt else -1.0
    }
    names.foreach(run) // warmup
    names.foreach { n =>
      val xs = (1 to reps).map(_ => run(n))
      val med = xs.sorted.apply(xs.length / 2)
      println(f"[probe] $n%-10s median=$med%.3f  samples=${xs.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
