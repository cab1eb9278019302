package graft

import graft.operators.Bpe

/** BPE tokenizer: hand-verified merge training, encode algebra, and the
  * q105 distributed application (codegen'd expression, plan-asserted). */
class BpeSpec extends SparkSpec {

  test("training learns the hand-computed merge sequence") {
    // corpus: "aaab" x10, "aab" x5  →  pair counts round 1:
    //   (a,a): 10*2 + 5*1 = 25;  (a,b): 15  →  merge 1 = (a,a)
    // round 2 over {aa a b x10, aa b x5}: (aa,a)=10, (a,b)=10, (aa,b)=5
    //   tie 10 = 10 → lexicographic: "a b" < "aa a" → merge 2 = (a,b)
    val m = Bpe.train(Seq("aaab" -> 10L, "aab" -> 5L), 3)
    assert(m.merges.take(2) == Seq(("a", "a"), ("a", "b")))
  }

  test("encode applies merges by rank and concatenation round-trips") {
    val m = Bpe.Model(Seq(("l", "o"), ("lo", "w"), ("e", "r")))
    assert(m.encodeWord("lower") == Seq("low", "er"))
    assert(m.encodeWord("low") == Seq("low"))
    assert(m.encodeWord("xyz") == Seq("x", "y", "z"))
    // round-trip: concatenated tokens always rebuild the word
    for (w <- Seq("lower", "low", "wool", "ollow", "x", ""))
      assert(m.encodeWord(w).mkString == w)
  }

  test("symbols are code points: a surrogate pair is one base symbol") {
    val emoji = new String(Character.toChars(0x1F600)) // non-BMP
    val m = Bpe.Model(Nil)
    // per-code-unit splitting would yield 2 lone-surrogate symbols
    assert(m.encodeWord(emoji) == Seq(emoji))
    assert(m.encodeWord(s"a${emoji}b").length == 3)
    // and training sees the emoji as one symbol: top pair is (a, emoji)
    val t = Bpe.train(Seq(s"a$emoji" -> 5L), 1)
    assert(t.merges == Seq(("a", emoji)))
  }

  test("countTokens = sum of per-word encode lengths; merges only shrink counts") {
    val m = Bpe.train(Seq("the" -> 100L, "then" -> 40L, "than" -> 30L), 5)
    val text = "the then than xq"
    val manual = text.split(' ').map(w => m.encodeWord(w).length).sum
    assert(m.countTokens(text) == manual)
    val none = Bpe.Model(Nil)
    assert(m.countTokens(text) <= none.countTokens(text))
    assert(none.countTokens(text) == text.replace(" ", "").length)
  }

  test("q105: trained-tokenizer counts are consistent and the expression codegens") {
    val df = graft.queries.TextAnalysis.q105(spark, sf)
    val rows = df.collect()
    // codegen spans (`*(N)` markers) materialize in the post-AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bpe_token_count"), plan)
    assert(plan.matches("(?s).*\\*\\(\\d+\\).*bpe_token_count.*"),
      s"encode fell out of codegen:\n$plan")
    assert(rows.length == 500)
    rows.foreach { r =>
      val (chars, ws, bpe) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // per word: 1 <= tokens <= word length, so ws <= bpe <= non-space chars
      assert(bpe >= ws, s"fewer tokens than words: $r")
      assert(bpe <= chars, s"more tokens than chars: $r")
    }
    // the tokenizer must actually compress: corpus-wide BPE tokens well
    // below character count
    val totBpe = rows.map(_.getLong(3)).sum.toDouble
    val totChars = rows.map(_.getLong(1)).sum.toDouble
    assert(totBpe < totChars * 0.6, s"merges not applied? bpe=$totBpe chars=$totChars")
  }
}
