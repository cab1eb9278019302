package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler string similarity — the
  * standard fuzzy-match scorer for entity-resolution dedup (public
  * algorithm: Jaro 1989 / Winkler 1990; also built into DuckDB as
  * `jaro_winkler_similarity`, which is what the oracle runs).
  *
  * Definition implemented (the common convention both DuckDB and Apache
  * Commons use): Jaro similarity from one-to-one character matches within
  * a `max(|a|,|b|)/2 - 1` window plus half-transposition count, then the
  * Winkler prefix boost `jaro + l·0.1·(1-jaro)` with `l` = common prefix
  * length capped at 4, applied when jaro > 0.7. Matching is over Unicode
  * code points, so supplementary-plane text scores by character, not by
  * UTF-16 surrogate halves (the q103 lesson from round 11's advice).
  * NB: DuckDB matches raw UTF-8 BYTES instead — measured: 😀 vs 😁 scores
  * 0.88 there (3 of 4 bytes shared) vs 0.0 here; the two agree exactly on
  * ASCII, which the q117 oracle keys are verified to be.
  *
  * Codegen: `doGenCode` emits a static call into [[JaroWinkler.compute]] —
  * the expression stays inside whole-stage codegen (no interpreted-fallback
  * barrier), same pattern as Spark's own `levenshtein`. The O(|a|·window)
  * inner loop is a plain primitive-array scan.
  *
  * Scale shape: a scalar — candidate PAIR generation must stay banded
  * (prefix blocking, q117) exactly like the other dedup verifiers; this
  * only prices the survivors.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  import org.apache.spark.sql.graftglue.Bridge

  /** Column-API entry: `JaroWinkler(col, col)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** Static entry the generated code calls. Public because codegen'd
    * classes live outside this package. */
  def compute(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.toString.codePoints.toArray
    val b = s2.toString.codePoints.toArray
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of relative order, halved
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    var p = 0
    while (p < 4 && p < l1 && p < l2 && a(p) == b(p)) p += 1
    if (jaro > 0.7) jaro + p * 0.1 * (1.0 - jaro) else jaro
  }
}
