package graft

import graft.ops.{Bpe, Unigram}
import org.apache.spark.sql.functions._

/** Round-13 additions: unigram-LM (SentencePiece) training + Viterbi
  * segmentation — the fourth trained tokenizer convention.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(w: String, costs: Seq[(String, Long)],
      maxChars: Int = 16): Seq[String] =
    Seq(Tuple1(w)).toDF("w")
      .select(Unigram.viterbiPieces(col("w"), costs, maxChars).as("t"))
      .collect()(0).getSeq[String](0)

  test("viterbi: min cost, then fewer pieces, then longest last piece") {
    val costs = Seq(("a", 10L), ("aa", 15L))
    // "aaa": a+aa and aa+a tie at (25, 2 pieces); the longest-LAST
    // tie-break picks a+aa (forward rule stores the longer piece at
    // the final position).
    assert(seg("aaa", costs) === Seq("a", "aa"))
    // "aa": piece aa (15,1) beats a+a (20,2) on cost alone.
    assert(seg("aa", costs) === Seq("aa"))
    // fewer-pieces tie-break: with cost(aa) = 2*cost(a), "aa" ties on
    // cost (20) and the single piece wins.
    assert(seg("aa", Seq(("a", 10L), ("aa", 20L))) === Seq("aa"))
    // cheaper-split dominance: cost(aa) > 2*cost(a) -> a+a.
    assert(seg("aa", Seq(("a", 10L), ("aa", 21L))) === Seq("a", "a"))
  }

  test("viterbi: [UNK] wholesale on unseen code points and over-length") {
    val costs = Seq(("a", 10L), ("b", 12L))
    assert(seg("ab", costs) === Seq("a", "b"))
    assert(seg("ax", costs) === Seq("[UNK]"))
    assert(seg("a" * 17, costs) === Seq("[UNK]"))
    assert(seg("", costs) === Seq.empty)
  }

  test("train: alphabet coverage, seed cap, prune count, determinism") {
    val docs = Seq((1L, "abab abab cd"), (2L, "abab cdcd ef"),
      (3L, "abab ababab"), (4L, "xyz"))
      .toDF("doc_id", "text")
    val p = Unigram.train(docs, "text", seedSize = 8, maxPieceLen = 3,
      emRounds = 2, pruneCount = 3)
    val tokens = p.map(_.token).toSet
    // Every observed code point survives (never pruned).
    for (c <- "abcdefxyz") assert(tokens.contains(c.toString), c)
    val multi = p.map(_.token).filter(t => t.codePointCount(0, t.length) >= 2)
    assert(multi.size == 8 - 3, s"seed 8 multi minus 3 pruned: $multi")
    // High-frequency substring must have seeded and survived.
    assert(tokens.contains("ab"), s"got $tokens")
    // Deterministic: a second run is identical including counts/costs.
    val p2 = Unigram.train(docs, "text", seedSize = 8, maxPieceLen = 3,
      emRounds = 2, pruneCount = 3)
    assert(p == p2)
  }

  test("train: driver-local == distributed") {
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the bat and the rat sat"), (3L, "concatenate that mattress"))
      .toDF("doc_id", "text")
    val local = Unigram.train(docs, "text", seedSize = 10,
      maxPieceLen = 4, emRounds = 2, pruneCount = 4)
    val dist = Unigram.train(docs, "text", seedSize = 10,
      maxPieceLen = 4, emRounds = 2, pruneCount = 4, driverCap = 0)
    assert(local == dist)
    graft.core.Caches.releaseAll()
  }

  test("tokenizeToIds: ids resolve, [UNK]=0 planted, empty text empty") {
    val train = Seq((1L, "abab abab cd"), (2L, "abab cd")).toDF("doc_id", "text")
    val p = Unigram.train(train, "text", seedSize = 4, maxPieceLen = 3,
      emRounds = 1, pruneCount = 1)
    val vocab = Unigram.vocabTable(spark, p)
    val docs = Seq((1L, "abab cd"), (2L, "qq abab"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Unigram.tokenizeToIds(docs, "text", "doc_id", p, vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(out(0)._2.nonEmpty && !out(0)._2.contains(0L))
    // "qq": q unseen -> [UNK] -> id 0; the rest still resolves.
    assert(out(1)._2.head == 0L && out(1)._2.drop(1).forall(_ > 0L))
    assert(out(2)._2.isEmpty)
    graft.core.Caches.releaseAll()
  }

  test("train: empty and null corpora yield the bare [UNK] vocabulary") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Unigram.train(empty, "text", 8) == Seq.empty)
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(Unigram.train(nulls, "text", 8) == Seq.empty)
    val v = Unigram.vocabTable(spark, Seq.empty)
    assert(v.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("[UNK]", 0L)))
  }

  test("seed scoring: count*len ordering with binary tie-break") {
    // "zz" appears 3x (count 3, len 2, score 6); "yyy" once (count 1,
    // len 3, score 3); with seedSize 1 only "zz" seeds, so "yyy"
    // segments through singles.
    val docs = Seq((1L, "zz zz zz yyy")).toDF("doc_id", "text")
    val p = Unigram.train(docs, "text", seedSize = 1, maxPieceLen = 3,
      emRounds = 1, pruneCount = 0)
    val multi = p.map(_.token).filter(_.length >= 2)
    assert(multi == Seq("zz"), s"got $multi")
  }
}
