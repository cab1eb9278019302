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

  /** q43 v1: group-and-expand — posting lists per shingle (bounded agg),
    * pairs generated map-side; replaces window + SMJ self-join. */
  def q43v1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = graft.queries.Dedup.shinglesN(spark, dir)
    val byKey = sh.groupBy($"shingle")
      .agg(graft.functions.BoundedPostingsAgg($"doc_id", $"n",
        graft.queries.Dedup.HotShingleCap.toInt).as("ds"))
      .filter($"ds".isNotNull && size($"ds") >= 2)
    byKey.select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1), " +
          "y -> struct(x.d AS d1, x.n AS n1, y.d AS d2, y.n AS n2))))")).as("p"))
      .select($"p.d1".as("d1"), $"p.n1".as("n1"), $"p.d2".as("d2"), $"p.n2".as("n2"))
      .filter(least($"n1", $"n2") * 10 >= greatest($"n1", $"n2") * 4)
      .groupBy($"d1", $"d2")
      .agg(count(lit(1)).as("c"), max($"n1").as("na"), max($"n2").as("nb"))
      .withColumn("jaccard", round($"c".cast("double") / ($"na" + $"nb" - $"c"), 4))
      .filter($"jaccard" >= 0.4)
      .select($"d1", $"d2", $"jaccard")
      .orderBy($"d1", $"d2")
  }

  /** q01 v1: conditional scan spread — repartition the (single-row-group)
    * scan before the partial aggregation so the decimal work parallelizes. */
  def q01v1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
    def msum(c: Column): Column = sum(dec2(c)).cast("double")
    def discPrice(price: Column, disc: Column): Column =
      price.cast(DecimalType(12, 2)) * (lit(1.0) - disc).cast(DecimalType(4, 2))
    def charge(price: Column, disc: Column, tax: Column): Column =
      discPrice(price, disc) * (lit(1.0) + tax).cast(DecimalType(4, 2))
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .select($"l_returnflag", $"l_linestatus", $"l_quantity",
        $"l_extendedprice", $"l_discount", $"l_tax")
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        msum($"l_quantity").as("sum_qty"),
        msum($"l_extendedprice").as("sum_base_price"),
        sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("sum_disc_price"),
        sum(charge($"l_extendedprice", $"l_discount", $"l_tax")).cast("double").as("sum_charge"),
        (msum($"l_quantity") / count(lit(1))).as("avg_qty"),
        (msum($"l_extendedprice") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** q126 v1: narrow probe shuffle — probes carry only (id_a, pcx, pcy);
    * coordinates re-derive from the id after the join (they are pure
    * functions of event_id), so the 9x-exploded exchange is 24 B/row. */
  def q126v1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eps = 0.5
    def px(id: Column): Column =
      (((id * 48271L) % 100003L * 69621L) % 99991L).cast("double") / lit(1000.0)
    def py(id: Column): Column =
      (((id * 69621L) % 99991L * 48271L) % 100003L).cast("double") / lit(1000.0)
    val cells = Tables.events(spark, dir).select(
      $"event_id", px($"event_id").as("x"), py($"event_id").as("y"))
      .withColumn("cx", floor($"x" / eps).cast("long"))
      .withColumn("cy", floor($"y" / eps).cast("long"))
    val probes = cells
      .select($"event_id".as("id_a"), $"cx", $"cy",
        explode(array(lit(-1L), lit(0L), lit(1L))).as("dx"))
      .select($"id_a", ($"cx" + $"dx").as("pcx"), $"cy",
        explode(array(lit(-1L), lit(0L), lit(1L))).as("dy"))
      .select($"id_a", $"pcx", ($"cy" + $"dy").as("pcy"))
    probes
      .join(cells, probes("pcx") === cells("cx") && probes("pcy") === cells("cy") &&
        probes("id_a") =!= cells("event_id") &&
        (px(probes("id_a")) - cells("x")) * (px(probes("id_a")) - cells("x")) +
          (py(probes("id_a")) - cells("y")) * (py(probes("id_a")) - cells("y")) <= eps * eps)
      .groupBy($"id_a")
      .agg(count(lit(1)).as("nbrs"))
      .select($"id_a".as("event_id"), px($"id_a").as("x"), py($"id_a").as("y"), $"nbrs")
      .orderBy($"event_id")
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43v0" -> graft.queries.Dedup.q43 _,
    "q43v1" -> (q43v1 _),
    "q01v0" -> graft.queries.Relational.q01 _,
    "q01v1" -> (q01v1 _),
    "q126v0" -> graft.queries.Similarity.queries("q126_grid_neighbors"),
    "q126v1" -> (q126v1 _))

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
