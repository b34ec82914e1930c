package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftExpectsInputTypes
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring search for phrase-level blocklists (§2.11
  * extensions — the UT1/phrase half of corpus filtering; q104's
  * [[graft.ops.Blocklist.blockedWordRatio]] covers single-WORD lexicons
  * by array intersection, which cannot match multi-word phrases or
  * intra-word fragments).
  *
  * One Aho-Corasick pass over the text finds which of the N patterns
  * occur as substrings: O(|text| + matches) per row regardless of N,
  * where the naive spelling — an OR-chain of `contains` or a
  * `filter(array(...), p -> contains(text, p))` HOF — re-scans the text
  * once per pattern, O(N·|text|). At blocklist scale (UT1 ships tens of
  * thousands of phrases) the naive form is two orders of magnitude more
  * scan CPU on every row of a 100 TB corpus.
  *
  * The automaton is built once per plan on the driver (the pattern list
  * is a query constant, like [[FreqOrderExpr]]'s table) and rebuilt
  * lazily per executor JVM from the serialized pattern array — the trie
  * itself never ships. Matching is char-exact on the raw text (no case
  * folding; callers lower() upstream if wanted), so the result equals
  * `[p for p in patterns if p in text]` — which is exactly the DuckDB
  * mirror `list_filter([...], p -> contains(text, p))`, making every
  * derived signal full-value oracle-checkable.
  */
final class AcAutomaton(patternsIn: Array[String]) extends Serializable {

  /** Deduplicated patterns in first-occurrence order — the output order
    * of [[matchedArray]]. Empty patterns are rejected (an empty needle
    * "matches" everywhere and poisons the trie root).
    */
  val patterns: Array[String] = {
    val seen = new java.util.LinkedHashSet[String]()
    patternsIn.foreach { p =>
      require(p != null && p.nonEmpty, "patterns must be non-empty strings")
      seen.add(p)
    }
    seen.toArray(new Array[String](seen.size))
  }

  @transient private lazy val patU8: Array[UTF8String] =
    patterns.map(UTF8String.fromString)

  // Trie state, rebuilt per JVM: goto maps per node, fail links, the
  // pattern index terminating at each node (-1 if none; distinct
  // patterns are distinct strings, so at most one per node), and the
  // dictionary suffix link (nearest fail-chain node with a terminal).
  private final class Trie(
      val gotoMaps: Array[java.util.HashMap[Character, Integer]],
      val fail: Array[Int],
      val emit: Array[Int],
      val dict: Array[Int])
  @transient private lazy val trie: Trie = build()

  private def build(): Trie = {
    val gm = new scala.collection.mutable.ArrayBuffer[
      java.util.HashMap[Character, Integer]]()
    val em = new scala.collection.mutable.ArrayBuffer[Int]()
    def newNode(): Int = {
      gm += new java.util.HashMap[Character, Integer]()
      em += -1
      gm.size - 1
    }
    newNode() // root = 0
    for (pi <- patterns.indices) {
      var s = 0
      val p = patterns(pi)
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        val nxt = gm(s).get(c)
        s = if (nxt != null) nxt.intValue()
        else { val n = newNode(); gm(s).put(c, Integer.valueOf(n)); n }
        i += 1
      }
      em(s) = pi
    }
    val n = gm.size
    val fl = new Array[Int](n)
    val dl = new Array[Int](n)
    java.util.Arrays.fill(dl, -1)
    val queue = new java.util.ArrayDeque[Integer]()
    gm(0).forEach { (_, v) => fl(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      dl(u) = if (em(fl(u)) != -1) fl(u) else dl(fl(u))
      gm(u).forEach { (c, v) =>
        var f = fl(u)
        while (f != 0 && !gm(f).containsKey(c)) f = fl(f)
        val t = gm(f).get(c)
        fl(v) = if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
        queue.add(v)
      }
    }
    new Trie(gm.toArray, fl, em.toArray, dl)
  }

  /** Patterns occurring in `text` as substrings, in [[patterns]] order
    * — value-equal to `list_filter(patterns, p -> contains(text, p))`.
    * Early-exits once every pattern has been seen.
    */
  def matchedArray(text: UTF8String): GenericArrayData = {
    val t0 = trie
    val g = t0.gotoMaps
    val fail = t0.fail
    val emit = t0.emit
    val dict = t0.dict
    val s = text.toString
    val np = patterns.length
    val found = new Array[Boolean](np)
    var remaining = np
    var state = 0
    var i = 0
    val len = s.length
    while (i < len && remaining > 0) {
      val c = Character.valueOf(s.charAt(i))
      var t = g(state).get(c)
      while (t == null && state != 0) { state = fail(state); t = g(state).get(c) }
      state = if (t != null) t.intValue() else 0
      var u = if (emit(state) != -1) state else dict(state)
      while (u != -1) {
        if (!found(emit(u))) { found(emit(u)) = true; remaining -= 1 }
        u = dict(u)
      }
      i += 1
    }
    val out = new Array[AnyRef](np - remaining)
    var pi = 0
    var oi = 0
    while (pi < np) {
      if (found(pi)) { out(oi) = patU8(pi); oi += 1 }
      pi += 1
    }
    new GenericArrayData(out)
  }
}

/** `multi_match(text)` over a constant pattern list: the array of
  * patterns present in the text as substrings, in pattern-list order.
  */
case class MultiMatchExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression with GraftExpectsInputTypes {
  require(patterns.nonEmpty, "multi_match needs at least one pattern")
  private val ac = new AcAutomaton(patterns.toArray)
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_match"
  override def nullSafeEval(input: Any): Any =
    ac.matchedArray(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.matchedArray($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): MultiMatchExpr =
    copy(child = newChild)
}
