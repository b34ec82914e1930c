package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenization as ONE native pass per row with a per-vocabulary
  * WORD CACHE ([[graft.ops.Bpe.tokenize]]'s fast path).
  *
  * The fold spelling (nested `replace` over the char-split word inside
  * a `transform` lambda) re-applies every merge to every word
  * OCCURRENCE — ~27M occurrences × 20 merges × 2 passes measured 117 s
  * of pure scan CPU at sf10m. But BPE is a pure per-WORD function and
  * real vocabularies are tiny next to the corpus (3.1k distinct words
  * under 27M occurrences there), so this expression memoizes
  * word → subword tokens per (vocabulary, JVM): each distinct word
  * pays the merge fold once, every other occurrence is one hash
  * lookup. Semantics are bit-identical to the fold (TrainSpec pins
  * expression == fold): same UTF8String lowercase, same `\s` split,
  * same code-point char split, same two-pass literal replace.
  *
  * Cache discipline: keyed by the exact merge list (no fingerprint
  * collisions), size-bounded — a vocabulary explosion (adversarial
  * high-entropy corpus) clears and refills rather than growing without
  * limit, degrading to the fold's per-occurrence cost in the worst
  * case, never OOM.
  */
case class BpeTokenizeExpr(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean = false)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftExpectsInputTypes {
  override def acceptedTypes: Seq[Seq[DataType]] = Seq(Seq(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokenize"

  @transient private lazy val table = BpeTokenizeOps.tableFor(merges, byteLevel)

  override def nullSafeEval(input: Any): Any =
    BpeTokenizeOps.tokenize(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference the MERGE LIST, not the Table: codegen references are
    // java-serialized per task, so embedding the Table would give every
    // task its own private word cache (cold for the whole task, defeating
    // the per-JVM sharing). Resolving through tableFor at generated-class
    // init instead lands every task of every stage on the ONE JVM-shared
    // Table for this vocabulary — the same instance the interpreted path
    // uses.
    val mergesRef = ctx.addReferenceObj("bpeMerges", merges,
      "scala.collection.immutable.Seq")
    val tableVar = ctx.addMutableState(
      classOf[BpeTokenizeOps.Table].getName, "bpeTable",
      v => s"$v = graft.functions.BpeTokenizeOps$$.MODULE$$.tableFor(" +
        s"(scala.collection.immutable.Seq) $mergesRef, $byteLevel);")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeTokenizeOps$$.MODULE$$.tokenize($c, $tableVar)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenizeExpr =
    copy(child = newChild)
}

object BpeTokenizeOps {

  /** Per-vocabulary state: the merge list, the convention, and the
    * word cache.
    */
  final class Table(val merges: Array[(String, String)],
      val byteLevel: Boolean) extends Serializable {
    @transient lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  }

  // One Table per distinct (merge list, convention) per JVM, so every
  // expression instance (and every task) shares the word cache. Keyed
  // by the exact merge sequence — no fingerprint collisions possible.
  private val tables = new java.util.concurrent.ConcurrentHashMap[
    (Seq[(String, String)], Boolean), Table]()

  def tableFor(merges: Seq[(String, String)], byteLevel: Boolean): Table = {
    if (tables.size() > 64) tables.clear()
    tables.computeIfAbsent((merges, byteLevel),
      m => new Table(m._1.toArray, m._2))
  }

  /** The merge fold for ONE word — identical semantics to
    * [[graft.ops.Bpe]]'s column fold: code-point char split, then per
    * merge the two-pass left-to-right literal replace on the padded
    * symbol string.
    */
  def applyMerges(word: String, merges: Array[(String, String)]): Array[UTF8String] = {
    val sb = new java.lang.StringBuilder(word.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp).append(' ')
      i += Character.charCount(cp)
    }
    var s = sb.toString
    var m = 0
    while (m < merges.length) {
      val (a, b) = merges(m)
      val pat = " " + a + " " + b + " "
      val rep = " " + a + b + " "
      s = s.replace(pat, rep).replace(pat, rep)
      m += 1
    }
    val t = s.trim
    if (t.isEmpty) Array.empty
    else t.split(" ").map(UTF8String.fromString)
  }

  def tokenize(text: UTF8String, table: Table): ArrayData =
    if (table.byteLevel) tokenizeBytes(text, table)
    else tokenizeWords(text, table)

  /** The byte-level merge fold for ONE pretoken: UTF-8 bytes as
    * uppercase hex pairs ([[graft.ops.Bpe.charSeqBytes]]'s local
    * twin), then the identical two-pass padded replace.
    */
  def applyMergesBytes(word: String,
      merges: Array[(String, String)]): Array[UTF8String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length * 3 + 2)
    sb.append(' ')
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(Character.toUpperCase(Character.forDigit(b >> 4, 16)))
        .append(Character.toUpperCase(Character.forDigit(b & 0xf, 16)))
        .append(' ')
      i += 1
    }
    var s = sb.toString
    var m = 0
    while (m < merges.length) {
      val (a, b) = merges(m)
      val pat = " " + a + " " + b + " "
      val rep = " " + a + b + " "
      s = s.replace(pat, rep).replace(pat, rep)
      m += 1
    }
    val t = s.trim
    if (t.isEmpty) Array.empty
    else t.split(" ").map(UTF8String.fromString)
  }

  // The byte-level pretokenizer — compiled once per JVM from the ONE
  // authoritative string (graft.ops.Bpe.byteLevelPattern, also
  // interpolated into the DuckDB oracle); Java and RE2 agree on the
  // lookahead-free pattern (leftmost-first alternation, an explicit
  // whitespace class — never `\s`, whose Java/RE2 semantics differ on
  // VT — and Unicode \p{L}/\p{N}).
  private val byteLevelRegex =
    java.util.regex.Pattern.compile(graft.ops.Bpe.byteLevelPattern)

  /** Byte-level path: case-preserving, regex pretokens (leading space
    * stays on the word, whitespace runs are their own pretokens), hex
    * byte symbols; same per-word cache discipline as the words path.
    */
  private def tokenizeBytes(text: UTF8String, table: Table): ArrayData = {
    val cache = table.cache
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val m = byteLevelRegex.matcher(text.toString)
    while (m.find()) {
      val w = m.group()
      var toks = cache.get(w)
      if (toks == null) {
        toks = applyMergesBytes(w, table.merges)
        if (cache.size() > 4000000) cache.clear()
        cache.putIfAbsent(w, toks)
      }
      out ++= toks
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def tokenizeWords(text: UTF8String, table: Table): ArrayData = {
    val cache = table.cache
    // UTF8String.toLowerCase = Spark's lower() exactly (HashedLinearOps
    // precedent; Java's full case mapping can diverge on e.g. U+0130).
    val s = text.toLowerCase.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val len = s.length
    // Exactly the Java-regex \s class the fold's split(\\s+) uses.
    def ws(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    while (i < len) {
      while (i < len && ws(s.charAt(i))) i += 1
      val start = i
      while (i < len && !ws(s.charAt(i))) i += 1
      if (i > start) {
        val w = s.substring(start, i)
        var toks = cache.get(w)
        if (toks == null) {
          toks = applyMerges(w, table.merges)
          // Bound check on the MISS path only — CHM.size() sums
          // counter cells and is a measurable contention point when
          // called per row under 32 scan threads (suite row 168s vs
          // 21s floor before this moved). An adversarial vocabulary
          // clears and refills (degrades to per-occurrence cost,
          // never OOM); 4M words ≈ well past any real subword vocab.
          if (cache.size() > 4000000) cache.clear()
          cache.putIfAbsent(w, toks)
        }
        out ++= toks
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}
