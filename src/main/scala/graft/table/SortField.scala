package graft.table

/** One `write.sort-by` entry: `name[:asc|desc[:nulls-first|nulls-last]]`.
  *
  * The property historically carried bare column names, which silently
  * collapsed a foreign table's declared desc / nulls-last write-order to
  * asc/nulls-first on the round-trip (ADVICE r10). Entries now carry the
  * full Iceberg sort-field semantics; bare names keep parsing (asc,
  * nulls-first — the Iceberg asc default), and [[render]] omits the
  * defaults so existing property values stay byte-stable. Null-order
  * defaults follow Iceberg DDL: asc → nulls-first, desc → nulls-last.
  * Column names containing `:` or `,` are not representable (same
  * restriction the comma-separated list always had).
  */
case class SortField(name: String, desc: Boolean, nullsLast: Boolean) {
  def direction: String = if (desc) "desc" else "asc"
  def nullOrder: String = if (nullsLast) "nulls-last" else "nulls-first"
  /** Canonical property form, defaults omitted. */
  def render: String = {
    val defaultNulls = desc // desc defaults to nulls-last
    if (!desc && !nullsLast) name
    else if (nullsLast == defaultNulls) s"$name:$direction"
    else s"$name:$direction:$nullOrder"
  }
}

object SortField {
  def apply(name: String, direction: String, nullOrder: String): SortField = {
    val desc = direction.toLowerCase match {
      case "desc" => true
      case "asc"  => false
      case d => throw new IllegalArgumentException(s"sort direction '$d' (asc|desc)")
    }
    val nullsLast = nullOrder.toLowerCase match {
      case "nulls-last"  => true
      case "nulls-first" => false
      case n => throw new IllegalArgumentException(s"null order '$n' (nulls-first|nulls-last)")
    }
    SortField(name, desc, nullsLast)
  }

  def parse(entry: String): SortField = entry.split(":").map(_.trim) match {
    case Array(n)       => SortField(n, desc = false, nullsLast = false)
    case Array(n, d)    =>
      val f = SortField(n, d, "nulls-first"); f.copy(nullsLast = f.desc)
    case Array(n, d, o) => SortField(n, d, o)
    case _ => throw new IllegalArgumentException(s"bad sort-by entry '$entry'")
  }

  /** Parse a comma-separated `write.sort-by` property value. */
  def parseList(v: String): Seq[SortField] =
    v.split(",").map(_.trim).filter(_.nonEmpty).map(parse).toSeq
}
