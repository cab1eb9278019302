package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md "Partitioning & shuffle" discipline):
  * when one join key dominates (a stop-word token, a null-ish default id, a
  * celebrity user), the stock shuffle sends every matching row to ONE reducer
  * and the stage runs at the speed of that task. Salting splits the hot key
  * across `salts` reducers at the cost of replicating the small side
  * `salts`×.
  *
  * AQE's skew-join handles this automatically for sort-merge joins when
  * statistics see the skew at runtime; explicit salting remains the tool for
  * aggregations-after-join shapes AQE can't split and for engines/stages
  * where AQE is off. Results are EXACTLY those of the unsalted join — the
  * salt never leaks into the output (verified against the plain-join oracle
  * by q61). */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, with `big`'s rows spread across
    * `salts` sub-keys and `small` replicated once per salt. The salt is a
    * deterministic hash of the big side's whole row, so rows of a hot key
    * distribute uniformly without any random state. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for a skewed group-by key: pre-aggregate on
    * (key, salt), then combine the partials per key. For algebraic
    * aggregates Spark's partial→final HashAggregate already does this
    * map-side; use the explicit form for holistic aggregates (collect_list
    * shown here) where the single reducer of a hot key would otherwise hold
    * the whole group. */
  def saltedCollect(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_list(col(valueCol)).as("_part"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("_part"))).as(s"${valueCol}_all"))
}
