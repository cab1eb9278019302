package graft

import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.table.{ColumnStats, DataFile, GraftTable, Snapshot}

/** Property test for the session-free stats pruner
  * (`GraftTable.pruneFilesByStats`) — the core now SHARED by the DSv2
  * pushdown path and the REST scan-planning endpoint, so a soundness bug
  * here would lose rows on two surfaces at once.
  *
  * Soundness invariant (the only one pruning must uphold): for any file
  * whose rows are exactly described by its min/max/null-count stats, a file
  * containing at least one row matching the filter is NEVER excluded.
  * Effectiveness (how much gets pruned) is deliberately unasserted —
  * keeping extra files is always correct. */
class StatsPruningSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val schemaJson = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)
  )).json

  /** A "file" = its actual rows; stats derived EXACTLY like the writer does
    * (string-rendered min/max + null count). */
  private case class F(rows: Seq[(Option[Long], Option[String])])

  private def statsOf(f: F): Map[String, ColumnStats] = {
    val ns = f.rows.flatMap(_._1)
    val ss = f.rows.flatMap(_._2)
    Seq(
      if (ns.isEmpty) None else Some("n" -> ColumnStats(
        ns.min.toString, ns.max.toString, "bigint", f.rows.count(_._1.isEmpty))),
      if (ss.isEmpty) None else Some("s" -> ColumnStats(
        ss.min, ss.max, "string", f.rows.count(_._2.isEmpty)))
    ).flatten.toMap
  }

  private def snap(files: Seq[F]): (Snapshot, Map[String, F]) = {
    val named = files.zipWithIndex.map { case (f, i) => s"f$i.parquet" -> f }
    (Snapshot(0L, -1L, 0L, "create", 0, Map("0" -> schemaJson),
      named.map { case (p, f) =>
        DataFile(p, f.rows.size, 1L, 0, statsOf(f))
      }), named.toMap)
  }

  private def matches(row: (Option[Long], Option[String]), flt: Filter): Boolean = {
    def cmp(c: String, v: Any): Option[Int] = c match {
      case "n" => row._1.map(x => java.lang.Long.compare(x, v.asInstanceOf[Long]))
      case "s" => row._2.map(x => x.compareTo(v.asInstanceOf[String]))
    }
    flt match {
      case EqualTo(c, v) => cmp(c, v).contains(0)
      case In(c, vs) => vs.exists(v => cmp(c, v).contains(0))
      case GreaterThan(c, v) => cmp(c, v).exists(_ > 0)
      case GreaterThanOrEqual(c, v) => cmp(c, v).exists(_ >= 0)
      case LessThan(c, v) => cmp(c, v).exists(_ < 0)
      case LessThanOrEqual(c, v) => cmp(c, v).exists(_ <= 0)
      case IsNull(c) => if (c == "n") row._1.isEmpty else row._2.isEmpty
      case And(l, r) => matches(row, l) && matches(row, r)
      case Or(l, r) => matches(row, l) || matches(row, r)
      case _ => true
    }
  }

  // the long domain mixes a small band with values ABOVE 2^53, where
  // adjacent longs collapse to the same double — the exact-compare
  // regression surface (ADVICE r15)
  private val bigBase = 1000000000000000000L // 1e18, snowflake-id scale
  private val genLong: Gen[Long] =
    Gen.oneOf(Gen.choose(-20L, 20L), Gen.choose(bigBase, bigBase + 20L))

  private val genRow: Gen[(Option[Long], Option[String])] = for {
    n <- Gen.option(genLong)
    s <- Gen.option(Gen.oneOf("a", "ab", "b", "ba", "c", "z", ""))
  } yield (n, s)

  private val genFile: Gen[F] = Gen.nonEmptyListOf(genRow).map(F(_))

  private val genLeaf: Gen[Filter] = {
    val nVal = Gen.oneOf(Gen.choose(-25L, 25L), Gen.choose(bigBase - 2L, bigBase + 22L))
    val sVal = Gen.oneOf("a", "ab", "b", "bb", "c", "y", "")
    Gen.oneOf(
      nVal.map(v => EqualTo("n", v)), sVal.map(v => EqualTo("s", v)),
      nVal.map(v => GreaterThan("n", v)), nVal.map(v => GreaterThanOrEqual("n", v)),
      nVal.map(v => LessThan("n", v)), nVal.map(v => LessThanOrEqual("n", v)),
      sVal.map(v => GreaterThan("s", v)), sVal.map(v => LessThan("s", v)),
      Gen.listOfN(3, nVal).map(vs => In("n", vs.map(v => v: Any).toArray)),
      Gen.oneOf("n", "s").map(IsNull(_)))
  }

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> (for (l <- genFilter(depth - 1); r <- genFilter(depth - 1)) yield And(l, r)),
      1 -> (for (l <- genFilter(depth - 1); r <- genFilter(depth - 1)) yield Or(l, r)))

  test("pruning never drops a file that contains a matching row (soundness)") {
    val prop = Prop.forAllNoShrink(
      Gen.nonEmptyListOf(genFile), genFilter(3)) { (files: List[F], flt: Filter) =>
      val (s, byPath) = snap(files)
      val kept = GraftTable.pruneFilesByStats(s, Seq(flt)).map(_.path).toSet
      s.files.forall { df =>
        val hasMatch = byPath(df.path).rows.exists(matches(_, flt))
        !hasMatch || kept.contains(df.path)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("known exclusions do fire (the pruner isn't a no-op)") {
    val (s, _) = snap(Seq(
      F(Seq((Some(1L), Some("a")), (Some(5L), Some("b")))),
      F(Seq((Some(100L), Some("x"))))))
    // n > 50 can only live in the second file
    val kept = GraftTable.pruneFilesByStats(s, Seq(GreaterThan("n", 50L)))
    assert(kept.map(_.path) == Seq("f1.parquet"))
    // IS NULL on a zero-null column prunes both
    assert(GraftTable.pruneFilesByStats(s, Seq(IsNull("n"))).isEmpty)
  }

  test("bounds above 2^53 compare exactly, not through doubles (ADVICE r15)") {
    // max = 1e18 + 1 and literal 1e18 round to the SAME double: a double
    // compare would prove GreaterThan-exclusion and drop the matching row
    val (s, _) = snap(Seq(F(Seq((Some(bigBase), None), (Some(bigBase + 1L), None)))))
    assert(GraftTable.pruneFilesByStats(s, Seq(GreaterThan("n", bigBase))).nonEmpty)
    // and the exact compare still EXCLUDES when exclusion is genuine
    assert(GraftTable.pruneFilesByStats(s, Seq(GreaterThan("n", bigBase + 1L))).isEmpty)
    assert(GraftTable.pruneFilesByStats(s, Seq(EqualTo("n", bigBase - 1L))).isEmpty)
  }
}
