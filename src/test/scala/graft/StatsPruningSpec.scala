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

  /** EXACT value set the way the writer records one (BoundedSetAgg): the
    * sorted distinct set when small, None past the caps — so the soundness
    * property below fuzzes MEMBERSHIP pruning against ground truth too. */
  private def setOf(vs: Seq[String]): Option[Seq[String]] = {
    val d = vs.distinct
    if (d.size <= 16 && d.forall(_.length <= 32)) Some(d.sorted) else None
  }

  private def statsOf(f: F): Map[String, ColumnStats] = {
    val ns = f.rows.flatMap(_._1)
    val ss = f.rows.flatMap(_._2)
    Seq(
      if (ns.isEmpty) None else Some("n" -> ColumnStats(
        ns.min.toString, ns.max.toString, "bigint", f.rows.count(_._1.isEmpty),
        setOf(ns.map(_.toString)))),
      if (ss.isEmpty) None else Some("s" -> ColumnStats(
        ss.min, ss.max, "string", f.rows.count(_._2.isEmpty),
        setOf(ss)))
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

  test("exact value sets prune equality/IN that ranges cannot") {
    // both files' RANGES contain 50/"m"; only the sets prove absence
    val (s, _) = snap(Seq(
      F(Seq((Some(1L), Some("a")), (Some(100L), Some("z")))),
      F(Seq((Some(2L), Some("b")), (Some(99L), Some("y"))))))
    assert(s.files.forall(_.stats("n").values.isDefined), "sets not recorded")
    assert(GraftTable.pruneFilesByStats(s, Seq(EqualTo("n", 50L))).isEmpty)
    assert(GraftTable.pruneFilesByStats(s, Seq(EqualTo("s", "m"))).isEmpty)
    assert(GraftTable.pruneFilesByStats(s, Seq(EqualTo("n", 99L)))
      .map(_.path) == Seq("f1.parquet"))
    assert(GraftTable.pruneFilesByStats(s,
      Seq(In("n", Array(50L: Any, 60L: Any)))).isEmpty)
    assert(GraftTable.pruneFilesByStats(s,
      Seq(In("s", Array("m": Any, "z": Any)))).map(_.path) == Seq("f0.parquet"))
    // range predicates still rule by bounds, never by membership
    assert(GraftTable.pruneFilesByStats(s, Seq(GreaterThan("n", 99L)))
      .map(_.path) == Seq("f0.parquet"))
  }

  // ---- canonical timestamp bounds (VERDICT r16 #1) ------------------------

  private val tsSchemaJson = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.TimestampType)
  )).json

  /** Snapshot of timestamp "files": rows are Option[micros]; stats rendered
    * exactly like the writer (canonical UTC 'T' form, all-null marker). */
  private def tsSnap(files: Seq[Seq[Option[Long]]]): Snapshot =
    Snapshot(0L, -1L, 0L, "create", 0, Map("0" -> tsSchemaJson),
      files.zipWithIndex.map { case (rows, i) =>
        val vs = rows.flatten
        val stats =
          if (vs.nonEmpty) Map("t" -> ColumnStats(
            GraftTable.tsCanon(vs.min), GraftTable.tsCanon(vs.max),
            "timestamp", rows.count(_.isEmpty)))
          else if (rows.nonEmpty) // writer's all-null marker
            Map("t" -> ColumnStats("", "", "timestamp", rows.size.toLong))
          else Map.empty[String, ColumnStats]
        DataFile(s"f$i.parquet", rows.size, 1L, 0, stats)
      })

  private def tsOf(micros: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))

  test("timestamp pruning is sound and zone-free for every literal form") {
    // micros spanning sub-second boundaries and a pre-epoch value
    val base = 1767225600L * 1000000L // 2026-01-01T00:00:00Z
    val genMicros: Gen[Long] = Gen.oneOf(
      Gen.choose(base, base + 5000000L), Gen.const(-1L), Gen.const(0L),
      Gen.choose(base + 86400000000L, base + 86400005000000L))
    val genTsRow: Gen[Option[Long]] = Gen.option(genMicros)
    val genTsFile: Gen[Seq[Option[Long]]] = Gen.nonEmptyListOf(genTsRow)
    // the same instant as Timestamp, Instant, and canonical wire string
    def litOf(m: Long, form: Int): Any = form match {
      case 0 => tsOf(m)
      case 1 => java.time.Instant.ofEpochSecond(
        Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L)
      case _ => GraftTable.tsCanon(m)
    }
    val genTsLeaf: Gen[Filter] = for {
      m <- genMicros; form <- Gen.choose(0, 2)
      f <- Gen.oneOf[Any => Filter](
        v => EqualTo("t", v), v => GreaterThan("t", v),
        v => GreaterThanOrEqual("t", v), v => LessThan("t", v),
        v => LessThanOrEqual("t", v))
    } yield f(litOf(m, form))
    val genTsFilter: Gen[Filter] = Gen.frequency(
      4 -> genTsLeaf,
      1 -> (for (l <- genTsLeaf; r <- genTsLeaf) yield And(l, r)),
      1 -> (for (l <- genTsLeaf; r <- genTsLeaf) yield Or(l, r)),
      1 -> Gen.const(IsNull("t")), 1 -> Gen.const(IsNotNull("t")))
    def rowMatches(row: Option[Long], flt: Filter): Boolean = flt match {
      case EqualTo(_, v) => row.exists(m => GraftTable.tsLitMicros(v).contains(m))
      case GreaterThan(_, v) => row.exists(m => GraftTable.tsLitMicros(v).exists(m > _))
      case GreaterThanOrEqual(_, v) => row.exists(m => GraftTable.tsLitMicros(v).exists(m >= _))
      case LessThan(_, v) => row.exists(m => GraftTable.tsLitMicros(v).exists(m < _))
      case LessThanOrEqual(_, v) => row.exists(m => GraftTable.tsLitMicros(v).exists(m <= _))
      case IsNull(_) => row.isEmpty
      case IsNotNull(_) => row.nonEmpty
      case And(l, r) => rowMatches(row, l) && rowMatches(row, r)
      case Or(l, r) => rowMatches(row, l) || rowMatches(row, r)
      case _ => true
    }
    val prop = Prop.forAllNoShrink(
      Gen.nonEmptyListOf(genTsFile), genTsFilter) { (files, flt) =>
      val s = tsSnap(files)
      val kept = GraftTable.pruneFilesByStats(s, Seq(flt)).map(_.path).toSet
      files.zipWithIndex.forall { case (rows, i) =>
        !rows.exists(rowMatches(_, flt)) || kept.contains(s"f$i.parquet")
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("timestamp exclusions fire, including equality AT the max bound") {
    val m0 = 1767225600L * 1000000L
    val s = tsSnap(Seq(
      Seq(Some(m0), Some(m0 + 1000000L)),        // [T, T+1s]
      Seq(Some(m0 + 3600000000L))))              // T+1h
    // equality at the first file's exact max must KEEP it (the legacy
    // lexical compare dropped it: Timestamp.toString appends ".0")
    val atMax = GraftTable.pruneFilesByStats(s, Seq(EqualTo("t", tsOf(m0 + 1000000L))))
    assert(atMax.map(_.path) == Seq("f0.parquet"))
    // a range above both files prunes everything
    assert(GraftTable.pruneFilesByStats(s,
      Seq(GreaterThan("t", tsOf(m0 + 7200000000L)))).isEmpty)
    // and the wire's canonical STRING literal prunes identically
    assert(GraftTable.pruneFilesByStats(s,
      Seq(GreaterThan("t", GraftTable.tsCanon(m0 + 7200000000L)))).isEmpty)
  }

  test("legacy space-form timestamp stats carry no claim (read-compat shim)") {
    // a stat written by an old log under an unknown session zone: pruning
    // must keep the file even when the rendered bounds LOOK excludable
    val legacy = Snapshot(0L, -1L, 0L, "create", 0, Map("0" -> tsSchemaJson),
      Seq(DataFile("old.parquet", 2L, 1L, 0, Map("t" ->
        ColumnStats("2020-01-01 00:00:00", "2020-01-02 00:00:00", "timestamp", 0L)))))
    val far = tsOf(1767225600L * 1000000L) // 2026 — outside the rendered bounds
    assert(GraftTable.pruneFilesByStats(legacy, Seq(EqualTo("t", far)))
      .map(_.path) == Seq("old.parquet"))
    assert(GraftTable.pruneFilesByStats(legacy, Seq(GreaterThan("t", far)))
      .map(_.path) == Seq("old.parquet"))
  }

  test("all-null marker prunes NOT NULL and every comparison, keeps IS NULL") {
    val s = tsSnap(Seq(Seq(None, None), Seq(Some(0L), None)))
    assert(GraftTable.pruneFilesByStats(s, Seq(IsNotNull("t")))
      .map(_.path) == Seq("f1.parquet"))
    assert(GraftTable.pruneFilesByStats(s, Seq(EqualTo("t", tsOf(0L))))
      .map(_.path) == Seq("f1.parquet"))
    assert(GraftTable.pruneFilesByStats(s, Seq(LessThanOrEqual("t", tsOf(0L))))
      .map(_.path) == Seq("f1.parquet"))
    // IS NULL keeps both (f0 is all null; f1 has one null)
    assert(GraftTable.pruneFilesByStats(s, Seq(IsNull("t"))).size == 2)
  }

  test("all-null marker on a STRING column never collides with a real empty-string file") {
    val strSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType))).json
    val s = Snapshot(0L, -1L, 0L, "create", 0, Map("0" -> strSchema), Seq(
      DataFile("allnull.parquet", 2L, 1L, 0,
        Map("s" -> ColumnStats("", "", "string", 2L))),   // marker
      DataFile("allempty.parquet", 2L, 1L, 0,
        Map("s" -> ColumnStats("", "", "string", 0L)))))  // genuine "" rows
    val kept = GraftTable.pruneFilesByStats(s, Seq(EqualTo("s", "")))
    assert(kept.map(_.path) == Seq("allempty.parquet"))
    assert(GraftTable.pruneFilesByStats(s, Seq(IsNotNull("s")))
      .map(_.path) == Seq("allempty.parquet"))
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
