package graft

import graft.functions.TextFunctions
import graft.functions.VectorFunctions._
import graft.ops.Dedup
import graft.query.FilterSpec
import graft.query.FilterSpec._
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded property-style suites (same style as ChunkSplitterSpec):
  * deterministic generated cases asserting semantic invariants —
  * filter-compiler equivalence against an in-memory reference
  * evaluator, hosts split/join inverses, cosine bounds, MinHash
  * determinism.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // ---- FilterSpec compile ≡ reference evaluation -------------------

  private def genSpec(rnd: Random, depth: Int): FilterSpec = {
    def leaf(): FilterSpec = rnd.nextInt(6) match {
      case 0 => Gte("a", rnd.nextInt(100))
      case 1 => Lte("a", rnd.nextInt(100))
      case 2 => Gt("b", rnd.nextInt(100))
      case 3 => Lt("b", rnd.nextInt(100))
      case 4 => EqTo("a", rnd.nextInt(100))
      case 5 => In("b", Seq.fill(3)(rnd.nextInt(100)))
    }
    if (depth == 0) leaf()
    else rnd.nextInt(4) match {
      case 0 => And(Seq.fill(2)(genSpec(rnd, depth - 1)))
      case 1 => Or(Seq.fill(2)(genSpec(rnd, depth - 1)))
      case 2 => Not(genSpec(rnd, depth - 1))
      case _ => leaf()
    }
  }

  private def evalRef(spec: FilterSpec, a: Int, b: Int): Boolean = spec match {
    case Gte(f, v) => (if (f == "a") a else b) >= v.asInstanceOf[Int]
    case Lte(f, v) => (if (f == "a") a else b) <= v.asInstanceOf[Int]
    case Gt(f, v)  => (if (f == "a") a else b) > v.asInstanceOf[Int]
    case Lt(f, v)  => (if (f == "a") a else b) < v.asInstanceOf[Int]
    case EqTo(f, v) => (if (f == "a") a else b) == v.asInstanceOf[Int]
    case In(f, vs) => vs.contains(if (f == "a") a else b)
    case And(ss)   => ss.forall(evalRef(_, a, b))
    case Or(ss)    => ss.exists(evalRef(_, a, b))
    case Not(s)    => !evalRef(s, a, b)
    case other     => fail(s"unexpected $other")
  }

  test("property: compiled FilterSpec selects exactly the reference-evaluated rows") {
    val rnd = new Random(7)
    val rows = Seq.tabulate(200)(i => (rnd.nextInt(100), rnd.nextInt(100), i))
    val df = rows.toDF("a", "b", "id").cache()
    for (_ <- 1 to 25) {
      val spec = genSpec(rnd, 3)
      val expected = rows.collect { case (a, b, id) if evalRef(spec, a, b) => id }.toSet
      val got = df.where(FilterSpec.compile(spec)).select("id").as[Int].collect().toSet
      assert(got == expected, s"spec $spec")
    }
  }

  // ---- hosts split/join inverses -----------------------------------

  test("property: joinHosts then splitHosts is identity on comma-free hosts") {
    val rnd = new Random(11)
    val cases = Seq.tabulate(50) { _ =>
      Seq.fill(rnd.nextInt(4))(("h" + rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString))
    }
    val df = cases.toDF("hosts")
      .select(TextFunctions.splitHosts(TextFunctions.joinHosts(col("hosts"))).as("rt"))
    val back = df.as[Seq[String]].collect().toSeq
    cases.zip(back).foreach { case (orig, rt) => assert(rt == orig) }
  }

  // ---- cosine bounds + self-similarity -----------------------------

  test("property: cosine within [-1,1] and exactly 1 on self (nonzero)") {
    val rnd = new Random(13)
    val vecs = Seq.tabulate(50)(_ => Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    val df = vecs.map(v => (v, v)).toDF("a", "b")
      .select(vecCosine(col("a"), col("b")).as("self"))
    df.as[Double].collect().foreach(s => assert(math.abs(s - 1.0) < 1e-9))
    val pairs = vecs.sliding(2).map(p => (p(0), p(1))).toSeq
    val cross = pairs.toDF("a", "b")
      .select(vecCosine(col("a"), col("b")).as("c")).as[Double].collect()
    cross.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
  }

  // ---- As-of join invariants ---------------------------------------

  test("property: asof matched_ts is the max right ts <= left ts per key") {
    val rnd = new Random(19)
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    for (_ <- 1 to 5) {
      val left = Seq.tabulate(40)(i => (i.toLong, (rnd.nextInt(5)).toLong, ts(rnd.nextInt(100))))
      val right = Seq.tabulate(30)(_ => ((rnd.nextInt(6)).toLong, ts(rnd.nextInt(100))))
      val out = graft.ops.AsOfJoin.asofMatchedTs(
          left.toDF("event_id", "user_id", "ts"), right.toDF("user_id", "ts"),
          "user_id", "ts")
        .select("event_id", "matched_ts")
        .as[(Long, Option[java.sql.Timestamp])].collect().toMap
      for ((id, key, t) <- left) {
        val expected = right.filter(r => r._1 == key && !r._2.after(t))
          .map(_._2).sortBy(_.getTime).lastOption
        assert(out(id) == expected, s"left row $id key $key ts $t")
      }
    }
  }

  // ---- MinHash determinism + identical-text collision --------------

  test("property: minhash signatures deterministic; identical texts always band-collide") {
    val rnd = new Random(17)
    val texts = Seq.tabulate(20)(_ =>
      Seq.fill(10 + rnd.nextInt(20))("w" + rnd.nextInt(30)).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sig1 = df.select(Dedup.minhashSignature(col("text"), 3, 16).as("s"))
      .as[Seq[Long]].collect().toSeq
    val sig2 = df.select(Dedup.minhashSignature(col("text"), 3, 16).as("s"))
      .as[Seq[Long]].collect().toSeq
    assert(sig1 == sig2)

    // duplicate every doc; candidates must contain every (i, i+20) pair
    val dup = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      texts.zipWithIndex.map { case (t, i) => (i.toLong + 20, t) }).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(dup, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    (0 until 20).foreach(i => assert(cands.contains((i.toLong, i.toLong + 20))))
  }

  test("property: exact prefix-filter join == brute force on random corpora and thresholds") {
    // Random small-vocabulary corpora maximize shared shingles (the
    // prefix filter's hardest case: dense candidate overlap, many
    // pairs near each threshold), plus random near-duplicates from
    // single-word edits.
    val rnd = new Random(23)
    for (round <- 0 until 3) {
      val vocabSize = 8 + rnd.nextInt(10)
      val base = Seq.tabulate(15) { i =>
        (i.toLong, Seq.fill(5 + rnd.nextInt(12))("w" + rnd.nextInt(vocabSize)).mkString(" "))
      }
      val edited = base.take(5).map { case (id, text) =>
        val words = text.split(" ").toBuffer
        words(rnd.nextInt(words.size)) = "w" + rnd.nextInt(vocabSize)
        (id + 100L, words.mkString(" "))
      }
      val df = (base ++ edited).toDF("doc_id", "text")
      val t = Seq(0.35, 0.5, 0.65, 0.8)(rnd.nextInt(4))
      val exact = Dedup.jaccardJoinExact(df, "text", "doc_id", t, shingleN = 2)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val brute = Dedup.jaccardPairsWithinBlock(
        df.withColumn("blk", lit(1)), "text", "doc_id", "blk", 2, t)
        .as[(Long, Long)].collect().toSet
      assert(exact == brute, s"round $round t=$t: ${exact.diff(brute)} / ${brute.diff(exact)}")
    }
  }

  test("property: connected components == union-find on random graphs") {
    import graft.ops.Components
    val rnd = new Random(41)
    for (round <- 0 until 3) {
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(n) {
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
      }.filter { case (a, b) => a != b }
      // Reference: path-compressed union-find, then min-id per root.
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val want = parent.keys.toSeq
        .groupBy(find).flatMap { case (_, vs) => vs.map(_ -> vs.min) }
      val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"round $round: $n edges")
    }
  }

  // ---- Session-2 ops: results are partition-layout invariant --------

  test("markov / budget cap / bottom-k / cascade / entity resolution are slicing-independent") {
    val rnd = new Random(91)
    val types = Seq("view", "click", "buy", "share")
    val ev = Seq.tabulate(500)(i =>
      (rnd.nextInt(30).toLong, rnd.nextInt(200).toLong, i.toLong,
        types(rnd.nextInt(4))))
      .toDF("user_id", "ts", "event_id", "event_type")
    val words = Seq("spark", "join", "hash", "scan", "merge", "sort", "agg")
    def text(): String =
      Seq.fill(rnd.nextInt(20) + 3)(words(rnd.nextInt(words.size))).mkString(" ")
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, s"src${i % 4}", text())).toDF("doc_id", "source", "text")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val expectM = canon(graft.ops.Markov.transitionMatrix(
      ev, "user_id", "ts", "event_type", "event_id"))
    val expectB = canon(graft.ops.BudgetCap.tokenBudgetCap(
      docs, "text", "doc_id", "source", 150L))
    val expectK = canon(graft.ops.Sampling.bottomKSample(
      docs.select(col("doc_id")), col("doc_id"), 20, "pp"))
    val expectC = canon(graft.ops.DedupCascade.cascade(docs, "text", "doc_id", 0.8, 3))
    for (parts <- Seq(1, 3, 13)) {
      val e = ev.repartition(parts)
      val d = docs.repartition(parts)
      assert(canon(graft.ops.Markov.transitionMatrix(
        e, "user_id", "ts", "event_type", "event_id")) == expectM,
        s"markov differs at $parts slices")
      assert(canon(graft.ops.BudgetCap.tokenBudgetCap(
        d, "text", "doc_id", "source", 150L)) == expectB,
        s"budget cap differs at $parts slices")
      assert(canon(graft.ops.Sampling.bottomKSample(
        d.select(col("doc_id")), col("doc_id"), 20, "pp")) == expectK,
        s"bottom-k differs at $parts slices")
      assert(canon(graft.ops.DedupCascade.cascade(d, "text", "doc_id", 0.8, 3)) ==
        expectC, s"cascade differs at $parts slices")
      graft.core.Caches.releaseAll()
    }
  }

  test("weighted sample / histogram / outliers / pagerank are slicing-independent") {
    val rnd = new Random(77)
    val docs = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(5000) + 1L))
      .toDF("doc_id", "n_chars")
    val ev = Seq.tabulate(400)(i =>
      (s"t${i % 3}", math.rint(rnd.nextDouble() * 10000) / 100))
      .toDF("event_type", "value")
    val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    for (parts <- Seq(1, 3, 13)) {
      val d = docs.repartition(parts)
      val e = ev.repartition(parts)
      val g = edges.repartition(parts)
      assert(canon(graft.ops.Sampling.weightedSampleK(
          d, col("doc_id"), col("n_chars"), k = 20, salt = "pp")) ==
        canon(graft.ops.Sampling.weightedSampleK(
          docs, col("doc_id"), col("n_chars"), k = 20, salt = "pp")),
        s"weightedSampleK differs at $parts slices")
      assert(canon(graft.ops.Histogram.equiDepth(e, "value", 10)) ==
        canon(graft.ops.Histogram.equiDepth(ev, "value", 10)),
        s"equiDepth differs at $parts slices")
      assert(canon(graft.ops.Outliers.zscoreOutliers(e, "event_type", "value", 3)) ==
        canon(graft.ops.Outliers.zscoreOutliers(ev, "event_type", "value", 3)),
        s"zscoreOutliers differs at $parts slices")
      assert(canon(graft.ops.PageRank.pageRankMicro(g, "src", "dst", 3)) ==
        canon(graft.ops.PageRank.pageRankMicro(edges, "src", "dst", 3)),
        s"pageRankMicro differs at $parts slices")
      graft.core.Caches.releaseAll()
    }
  }
}
