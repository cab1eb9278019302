package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hidden-partitioning transforms (Iceberg's signature feature, enabled for
  * the reference stack by `main.tf:803`; SURVEY.md §1 "Partitioning"):
  * partition values are DERIVED from a column — `bucket(n, col)`,
  * `truncate(w, col)`, `years/months/days/hours(col)` — so queries filter on
  * the source column and pruning happens in metadata, invisibly.
  *
  * Engine mechanics: a transform listed in the `write.partition-by` table
  * property (1) hash-distributes writes on its VALUE, so each data file
  * covers few partition values, and (2) records the value's min/max per file
  * in the snapshot log under the transform's canonical name, which
  * [[GraftTable.pruneFiles]] checks against query filters on the SOURCE
  * column — order-preserving transforms prune ranges, bucket prunes
  * equality/IN. Existing files keep their layout on spec evolution (files
  * without transform stats are simply never pruned by it), exactly like
  * Iceberg's spec evolution.
  */
sealed trait PartitionTransform {
  /** Source column the transform derives from. */
  def source: String
  /** Canonical spec string — also the per-file stats key. */
  def canonical: String
  /** Transform value as a Spark column (the write-distribution key and the
    * stats-collection expression). */
  def column(c: Column): Column
  /** Compare recorded bounds numerically (vs lexically). */
  def numeric: Boolean
  /** a <= b implies t(a) <= t(b): range filters prune through the transform. */
  def orderPreserving: Boolean
}

object PartitionTransform {

  case class Identity(source: String) extends PartitionTransform {
    val canonical: String = source
    def column(c: Column): Column = c
    val numeric = false // unused: identity stats ride the plain column-stats path
    val orderPreserving = true
  }

  /** `bucket(n, col)`: pmod(xxhash64(col :: string), n) — a uniform hash
    * bucket; equality/IN filters prune, ranges cannot (not order-preserving).
    * String canonicalization makes the bucket of a filter literal computable
    * for any comparable source type.
    *
    * TIMESTAMP sources are special (VERDICT r17 #3): `cast(ts as string)`
    * renders under the writer's SESSION ZONE, so two writers in different
    * zones scatter the same instant across different buckets — layout
    * co-location silently broken, and pruning unsound (the r17 guard makes
    * legacy layouts claim nothing). Tables stamped
    * `write.transform-version >= 2` (every table created from r18 on, and
    * anything `CALL refresh_stats` has upgraded) hash the ZONE-FREE
    * `unix_micros(ts)` instead (`tsMicros = true`): same instant → same
    * bucket from any session, layout co-locates, equality/IN prunes. */
  case class Bucket(source: String, n: Int, tsMicros: Boolean = false)
      extends PartitionTransform {
    val canonical = s"bucket($n,$source)"
    def column(c: Column): Column =
      if (tsMicros) pmod(xxhash64(unix_micros(c)), lit(n.toLong))
      else pmod(xxhash64(c.cast("string")), lit(n.toLong))
    val numeric = true
    val orderPreserving = false
  }

  /** `iceberg_bucket(n, col)`: the Iceberg-SPEC bucket — murmur3 x86-32
    * (seed 0) over the spec's type-specific byte encodings
    * ([[graft.functions.IcebergMurmur3]]), `(hash & Int.MaxValue) % n`.
    * Same pruning behavior as [[Bucket]] (equality/IN, not ranges), but
    * because the hash matches the spec bit-for-bit, tables partitioned with
    * it EXPORT a true `bucket[n]` Iceberg partition spec that Trino/Spark
    * prune with — the opt-in interop variant of graft's xxhash64 bucket. */
  case class IcebergBucket(source: String, n: Int) extends PartitionTransform {
    val canonical = s"iceberg_bucket($n,$source)"
    def column(c: Column): Column = graft.functions.IcebergBucket(c, n)
    val numeric = true
    val orderPreserving = false
  }

  /** `truncate(w, col)`: strings → first w chars; integers → floor to a
    * multiple of w (v - pmod(v, w), Iceberg's definition — correct for
    * negatives). Order-preserving either way. */
  case class Truncate(source: String, w: Int, isString: Boolean) extends PartitionTransform {
    val canonical = s"truncate($w,$source)"
    def column(c: Column): Column =
      if (isString) substring(c, 1, w) else (c - pmod(c, lit(w.toLong))).cast("long")
    def numeric: Boolean = !isString
    val orderPreserving = true
  }

  /** `years/months/days/hours(col)`: the ICEBERG-SPEC integer value —
    * years/months since 1970, days as epoch-day, hours since epoch — over
    * the UTC instant (timestamp source) or the calendar date (date
    * source). Zone-free by construction (the previous `date_trunc` form
    * rendered under the writing SESSION's zone, so the REST scan planner —
    * which has no session — could never prune it, and a zone change
    * between writer and reader skewed bounds; VERDICT r16 #3). Legacy ISO
    * transform stats simply stop pruning (numeric parse refuses them)
    * until a rewrite refreshes the files. */
  case class TimeTrunc(source: String, fn: String, isDate: Boolean)
      extends PartitionTransform {
    val canonical = s"$fn($source)"
    val numeric = true
    val orderPreserving = true
    def column(c: Column): Column = {
      // exact floor-division (div truncates; the pmod-subtracted numerator
      // is an exact multiple, so truncation IS floor — no double rounding)
      def fdiv(x: Column, y: Long): Column =
        org.apache.spark.sql.graftglue.Bridge.column(
          org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.graftglue.Bridge.expression(x - pmod(x, lit(y))),
            org.apache.spark.sql.catalyst.expressions.Literal(y)))
      def epochDay: Column =
        if (isDate) datediff(c, to_date(lit("1970-01-01"))).cast("long")
        else fdiv(unix_micros(c), 86400000000L)
      fn match {
        case "days" => epochDay
        case "hours" =>
          if (isDate) epochDay * lit(24L)
          else fdiv(unix_micros(c), 3600000000L)
        case f @ ("months" | "years") =>
          val d = if (isDate) c
            else date_add(to_date(lit("1970-01-01")), epochDay.cast("int"))
          if (f == "years") (year(d) - lit(1970)).cast("long")
          else ((year(d) - lit(1970)) * lit(12) + month(d) - lit(1)).cast("long")
      }
    }
  }

  private val Fn = """^([A-Za-z_]+)\(([^)]*)\)$""".r

  /** Table property versioning HOW transform values are computed (the spec
    * STRINGS are stable; this versions their semantics). Absent = 1 (the
    * legacy session-zone bucket(ts) hash, kept so existing layouts stay
    * self-consistent); >= 2 = zone-free timestamp bucketing. Stamped on
    * every newly created table; `refresh_stats` upgrades existing ones. */
  val VersionKey = "write.transform-version"

  def versionOf(props: Map[String, String]): Int =
    props.get(VersionKey).flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .getOrElse(1)

  /** Stamp a freshly-created table's properties with the CURRENT transform
    * version (explicit caller-provided values win — a migration tool may
    * deliberately pin 1 to reproduce a legacy layout). */
  def stampVersion(props: Map[String, String]): Map[String, String] =
    if (props.contains(VersionKey)) props else props + (VersionKey -> "2")

  /** Parse one spec: a bare column name (identity) or `fn(args)`. `schema`
    * resolves the source column (required to exist) and drives the
    * string-vs-numeric truncate variant. `v2` = the table's transform
    * version is >= 2 ([[versionOf]]): timestamp buckets hash zone-free. */
  def parse(spec: String, schema: StructType, v2: Boolean = false): PartitionTransform = {
    def field(name: String): StructField =
      schema.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"partition transform '$spec': no column $name"))
    spec.trim match {
      case Fn(fn, argStr) =>
        val args = argStr.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        fn.toLowerCase match {
          case "identity" =>
            require(args.length == 1, s"identity takes 1 argument: $spec")
            Identity(field(args.head).name)
          case "bucket" =>
            require(args.length == 2, s"bucket takes (n, col): $spec")
            val f = field(args(1))
            require(args.head.toInt > 0, s"bucket count must be > 0: $spec")
            Bucket(f.name, args.head.toInt,
              tsMicros = v2 && f.dataType == TimestampType)
          case "iceberg_bucket" =>
            require(args.length == 2, s"iceberg_bucket takes (n, col): $spec")
            val f = field(args(1))
            require(f.dataType match {
              case IntegerType | LongType | ShortType | ByteType | DateType |
                   TimestampType | TimestampNTZType | StringType | BinaryType |
                   _: DecimalType => true
              case _ => false
            }, s"iceberg_bucket cannot bucket a ${f.dataType.simpleString} column: $spec")
            IcebergBucket(f.name, args.head.toInt)
          case "truncate" =>
            require(args.length == 2, s"truncate takes (w, col): $spec")
            val f = field(args(1))
            Truncate(f.name, args.head.toInt, f.dataType == StringType)
          case t @ ("years" | "months" | "days" | "hours") =>
            require(args.length == 1, s"$t takes 1 argument: $spec")
            val f = field(args.head)
            require(f.dataType == TimestampType || f.dataType == DateType,
              s"$t requires a timestamp/date column, ${f.name} is ${f.dataType.simpleString}")
            TimeTrunc(f.name, t, f.dataType == DateType)
          case other =>
            throw new IllegalArgumentException(s"unknown partition transform '$other' in $spec")
        }
      case bare => Identity(field(bare).name)
    }
  }

  /** Split a `write.partition-by` property on commas OUTSIDE parentheses
    * ("bucket(16,id),days(ts)" → two specs) and parse each. */
  def parseList(prop: Option[String], schema: StructType,
      v2: Boolean = false): Seq[PartitionTransform] =
    prop.toSeq
      .flatMap(_.split(""",(?![^(]*\))"""))
      .map(_.trim).filter(_.nonEmpty)
      .map(parse(_, schema, v2))

  /** [[parseList]] from a table's full property map — THE entry point for
    * every caller that computes or compares transform VALUES (write layout,
    * stats collection, pruning): it threads [[versionOf]] so a v2 table's
    * timestamp buckets hash zone-free. Canonical-name-only callers
    * (DDL validation, metadata rendering) may keep the bare form. */
  def parseListFrom(props: Map[String, String],
      schema: StructType): Seq[PartitionTransform] =
    parseList(props.get("write.partition-by"), schema, versionOf(props) >= 2)

  /** SESSION-FREE evaluation of an order-preserving transform over a
    * filter literal, rendered exactly as the per-file transform stats are
    * — shared by the engine's local pruning and the REST scan planner,
    * which has no SparkSession to evaluate a transform with (VERDICT r16
    * #3). None = no claim (the engine falls back to its Spark-eval path
    * for bucket hashes; the server just doesn't prune that term). */
  def evalOrderPreserving(t: PartitionTransform, v: Any): Option[String] = t match {
    case _ if v == null => None
    case Truncate(_, w, true) => v match {
      // Spark's substring counts CODE POINTS; Java's String.substring counts
      // UTF-16 units. Truncating by units would render a SHORTER prefix than
      // the recorded stats for literals with supplementary characters in the
      // first w positions, wrongly excluding the matching file (ADVICE r17).
      case s: String =>
        val cps = s.codePointCount(0, s.length)
        Some(s.substring(0, s.offsetByCodePoints(0, math.min(w, cps))))
      case _ => None
    }
    case Truncate(_, w, false) => v match {
      case n @ (_: Long | _: Int | _: Short | _: Byte) =>
        val x = n.asInstanceOf[Number].longValue
        Some((x - Math.floorMod(x, w.toLong)).toString)
      case _ => None // decimal/float truncate literals: Spark-eval path only
    }
    case TimeTrunc(_, fn, isDate) =>
      val utcDay: Option[java.time.LocalDate] =
        if (isDate) v match {
          case d: java.sql.Date => Some(d.toLocalDate)
          case d: java.time.LocalDate => Some(d)
          case s: String => scala.util.Try(java.time.LocalDate.parse(s.trim)).toOption
          case _ => None
        }
        else GraftTable.tsLitMicros(v).map(m =>
          java.time.LocalDate.ofEpochDay(Math.floorDiv(m, 86400000000L)))
      fn match {
        case "days" => utcDay.map(_.toEpochDay.toString)
        case "hours" =>
          if (isDate) utcDay.map(d => (d.toEpochDay * 24L).toString)
          else GraftTable.tsLitMicros(v).map(m =>
            Math.floorDiv(m, 3600000000L).toString)
        case "months" => utcDay.map(d =>
          ((d.getYear - 1970L) * 12L + d.getMonthValue - 1L).toString)
        case "years" => utcDay.map(d => (d.getYear - 1970L).toString)
        case _ => None
      }
    case _ => None // identity rides the plain column stats; buckets hash
  }

  /** SESSION-FREE evaluation of a HASH transform (bucket / iceberg_bucket)
    * over a filter literal — valid for EQUALITY/IN pruning only (hashes are
    * not order-preserving; [[GraftTable.transformExcluded]]'s range arms
    * gate on `orderPreserving` and never consult this). Lets the REST scan
    * planner prune `bucket(n, k) = v` terms like the engine does locally,
    * and spares the engine a driver-local Spark job per literal.
    *
    * Soundness rides on rendering the literal EXACTLY as the transform
    * column rendered the data (property-tested against the Spark column
    * eval in HiddenPartitioningSpec): only literal/source-type pairs whose
    * `cast(x as string)` is the plain JVM rendering qualify — strings,
    * integrals, booleans, dates. Everything else (float/decimal formatting,
    * NTZ renderings, zone-dependent v1 timestamp buckets) returns None: no
    * claim, keep the file (the engine falls back to Spark eval; the server
    * just doesn't prune that term). `srcType` is the SOURCE column's schema
    * type — literal dispatch alone can't tell a string column's literal
    * from a wire-form timestamp string. */
  def evalBucket(t: PartitionTransform, v: Any,
      srcType: Option[DataType]): Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.unsafe.types.UTF8String
    def xx(lit: Literal): Long =
      XxHash64(Seq(lit), 42L).eval(null).asInstanceOf[Long]
    // the plain renderings that match Spark's cast-to-string exactly
    def render(dt: DataType): Option[String] = (dt, v) match {
      case (StringType, s: String) => Some(s)
      case (IntegerType | LongType | ShortType | ByteType,
            n @ (_: Int | _: Long | _: Short | _: Byte)) => Some(n.toString)
      case (BooleanType, b: Boolean) => Some(b.toString)
      case (DateType, d: java.sql.Date) => Some(d.toLocalDate.toString)
      case (DateType, d: java.time.LocalDate) => Some(d.toString)
      case _ => None
    }
    if (v == null) return None
    t match {
      // a non-positive bucket count is malformed metadata: the Spark-eval
      // fallback answers null there (no claim); floorMod would THROW on
      // every read instead — same no-claim here
      case b: Bucket if b.n <= 0 => None
      case ib: IcebergBucket if ib.n <= 0 => None
      case b: Bucket if b.tsMicros => // zone-free v2: hash unix_micros
        GraftTable.tsLitMicros(v).map(m =>
          Math.floorMod(xx(Literal(m, LongType)), b.n.toLong).toString)
      case _: Bucket if srcType.contains(TimestampType) =>
        None // legacy v1 ts bucket: zone-dependent, never a claim
      case b: Bucket =>
        srcType.flatMap(render).map(s =>
          Math.floorMod(xx(Literal(UTF8String.fromString(s), StringType)),
            b.n.toLong).toString)
      case ib: IcebergBucket =>
        import graft.functions.IcebergMurmur3
        val hash: Option[Int] = srcType.flatMap {
          case IntegerType | LongType | ShortType | ByteType => v match {
            case n @ (_: Int | _: Long | _: Short | _: Byte) =>
              Some(IcebergMurmur3.hashLong(n.asInstanceOf[Number].longValue))
            case _ => None
          }
          case DateType => (v match { // spec: date hashes as epoch-day int
            case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
            case d: java.time.LocalDate => Some(d.toEpochDay)
            case _ => None
          }).map(IcebergMurmur3.hashLong)
          case TimestampType | TimestampNTZType => // spec: micros long
            GraftTable.tsLitMicros(v).map(IcebergMurmur3.hashLong)
          case StringType => v match {
            case s: String => Some(IcebergMurmur3.hashUtf8(UTF8String.fromString(s)))
            case _ => None
          }
          case BinaryType => v match {
            case b: Array[Byte] => Some(IcebergMurmur3.hashBytes(b))
            case _ => None
          }
          case _ => None // decimal: literal scale may differ from the column's
        }
        hash.map(h => IcebergMurmur3.bucketOf(h, ib.n).toString)
      case _ => None
    }
  }
}
