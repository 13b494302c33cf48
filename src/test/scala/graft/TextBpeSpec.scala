package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** BPE tokenizer training (TextAnalysis.bpeTrain/bpeVocab) against
  * hand-computed merge sequences — including the Sennrich corpus shape,
  * deterministic tie-breaks, the greedy a=b non-overlap rule, and early
  * exhaustion on a fully-merged vocabulary.
  */
class TextBpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("bpeTrain learns the hand-computed merge sequence (Sennrich shape)") {
    // low x5, lower x2, newest x6, widest x3 — the classic worked example
    val d = corpus(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest")
    val merges = TextAnalysis.bpeTrain(d, rounds = 6)
      .orderBy("round")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges === Seq(
      (1L, "e", "s", 9L),   // es:9 ties st:9 — lexicographic tie-break
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),   // lo:7 ties ow:7
      (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L),   // three-way tie at 6: (e,w) < (n,ew) < (w,est)
      (6L, "ew", "est", 6L)))
  }

  test("bpeVocab emits the trained tokenization's token counts") {
    val d = corpus(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest")
    // after the 6 merges above: low -> [low], lower -> [low, e, r],
    // newest -> [n, ewest], widest -> [w, i, d, est]
    val vocab = TextAnalysis.bpeVocab(d, rounds = 6)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(vocab === Map(
      "low" -> 7L, "e" -> 2L, "r" -> 2L,
      "n" -> 6L, "ewest" -> 6L,
      "w" -> 3L, "i" -> 3L, "d" -> 3L, "est" -> 3L))
  }

  test("greedy left-to-right non-overlap for self-pairs (a,a)") {
    // "aaaa": round 1 counts (a,a) at 3 adjacent positions but merges
    // greedily into [aa, aa]; round 2 merges (aa, aa) once
    val d = corpus("aaaa")
    val merges = TextAnalysis.bpeTrain(d, rounds = 2)
      .orderBy("round")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges === Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
    val vocab = TextAnalysis.bpeVocab(d, rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(vocab === Map("aaaa" -> 1L))
  }

  test("odd-length self-pair runs keep the trailing singleton") {
    // "aaaaa" -> [aa, aa, a]: the 5th char survives round 1
    val d = corpus("aaaaa")
    val vocab = TextAnalysis.bpeVocab(d, rounds = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(vocab === Map("aa" -> 2L, "a" -> 1L))
  }

  test("training stops early when the vocabulary is fully merged") {
    val d = corpus("ab ab ab")
    // one merge exhausts every pair; requesting 10 rounds yields 1 row
    val merges = TextAnalysis.bpeTrain(d, rounds = 10)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges === Seq((1L, "a", "b", 3L)))
  }

  test("merge application only touches words containing the pair") {
    val d = corpus("xy xy xy qr")
    val merges = TextAnalysis.bpeTrain(d, rounds = 1)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges === Seq(("x", "y", 3L)))
    val vocab = TextAnalysis.bpeVocab(d, rounds = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(vocab === Map("xy" -> 3L, "q" -> 1L, "r" -> 1L))
  }
}
