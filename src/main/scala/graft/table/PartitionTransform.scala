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
    * for any comparable source type. */
  case class Bucket(source: String, n: Int) extends PartitionTransform {
    val canonical = s"bucket($n,$source)"
    def column(c: Column): Column = pmod(xxhash64(c.cast("string")), lit(n.toLong))
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

  /** `years/months/days/hours(col)`: date_trunc on a timestamp/date column;
    * the value is stored as an ISO string, which compares lexically in time
    * order. */
  case class TimeTrunc(source: String, fn: String) extends PartitionTransform {
    private val unit = fn match {
      case "years" => "year"; case "months" => "month"
      case "days" => "day";   case "hours" => "hour"
    }
    val canonical = s"$fn($source)"
    def column(c: Column): Column = date_trunc(unit, c)
    val numeric = false
    val orderPreserving = true
  }

  private val Fn = """^([A-Za-z_]+)\(([^)]*)\)$""".r

  /** Parse one spec: a bare column name (identity) or `fn(args)`. `schema`
    * resolves the source column (required to exist) and drives the
    * string-vs-numeric truncate variant. */
  def parse(spec: String, schema: StructType): PartitionTransform = {
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
            Bucket(field(args(1)).name, args.head.toInt)
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
            TimeTrunc(f.name, t)
          case other =>
            throw new IllegalArgumentException(s"unknown partition transform '$other' in $spec")
        }
      case bare => Identity(field(bare).name)
    }
  }

  /** Split a `write.partition-by` property on commas OUTSIDE parentheses
    * ("bucket(16,id),days(ts)" → two specs) and parse each. */
  def parseList(prop: Option[String], schema: StructType): Seq[PartitionTransform] =
    prop.toSeq
      .flatMap(_.split(""",(?![^(]*\))"""))
      .map(_.trim).filter(_.nonEmpty)
      .map(parse(_, schema))
}
