package graft.chunk

import scala.collection.mutable.ArrayBuffer

/** One ASR/caption segment (reference `TranscriptSnippet`,
  * extractors/utils/types.py:18-21).
  */
case class Snippet(text: String, start: Double, duration: Double)

/** One overlapping text chunk (reference `TranscriptChunk`,
  * core/types.py:6-8).
  */
case class Chunk(text: String, start: Double)

/** G1 `chunk_transcript_with_overlap` (extractors/utils/helpers/
  * transcript.py:92-168) — the pipeline's signature operator, re-expressed
  * as pure per-row Scala so it runs as a typed `flatMap` with no shuffle.
  *
  * The splitter reproduces the publicly documented LangChain
  * RecursiveCharacterTextSplitter algorithm: try separators
  * ["\n\n", "\n", " ", ""] in order, keep the separator attached to the
  * front of the following split, recursively split oversized pieces with
  * the remaining separators, then greedily merge splits up to
  * `chunkSize` chars carrying `chunkOverlap` chars of trailing context
  * into the next chunk; joined chunks are whitespace-stripped and empty
  * results dropped.
  */
object ChunkSplitter {

  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")

  /** Split `text` into chunks of at most ~chunkSize chars with
    * ~chunkOverlap chars of overlap (best-effort, like the reference).
    */
  def splitText(
      text: String,
      chunkSize: Int = 1000,
      chunkOverlap: Int = 200,
      separators: List[String] = DefaultSeparators): Vector[String] =
    splitRecursive(text, chunkSize, chunkOverlap, separators)

  private def splitRecursive(
      text: String,
      chunkSize: Int,
      chunkOverlap: Int,
      separators: List[String]): Vector[String] = {
    // Pick the first separator that occurs in the text ("" always matches).
    var separator = separators.lastOption.getOrElse("")
    var newSeparators: List[String] = Nil
    val it = separators.iterator
    var idx = 0
    var found = false
    while (it.hasNext && !found) {
      val s = it.next()
      if (s == "") { separator = s; found = true }
      else if (text.contains(s)) {
        separator = s
        newSeparators = separators.drop(idx + 1)
        found = true
      }
      idx += 1
    }

    val splits = splitWithSeparator(text, separator)

    val finalChunks = ArrayBuffer.empty[String]
    val goodSplits = ArrayBuffer.empty[String]
    for (s <- splits) {
      if (s.length < chunkSize) goodSplits += s
      else {
        if (goodSplits.nonEmpty) {
          finalChunks ++= mergeSplits(goodSplits.toVector, chunkSize, chunkOverlap)
          goodSplits.clear()
        }
        if (newSeparators.isEmpty) finalChunks += s
        else finalChunks ++= splitRecursive(s, chunkSize, chunkOverlap, newSeparators)
      }
    }
    if (goodSplits.nonEmpty)
      finalChunks ++= mergeSplits(goodSplits.toVector, chunkSize, chunkOverlap)
    finalChunks.toVector
  }

  /** Split keeping the separator attached to the front of the following
    * piece: "a b c" with " " -> ["a", " b", " c"]; "" -> per-character.
    * Empty pieces are dropped.
    */
  private[chunk] def splitWithSeparator(text: String, separator: String): Vector[String] = {
    if (separator.isEmpty) return text.map(_.toString).toVector
    val out = ArrayBuffer.empty[String]
    var i = 0
    var pieceStart = 0
    var first = true
    while (i <= text.length - separator.length) {
      if (text.regionMatches(i, separator, 0, separator.length)) {
        val end = if (first) i else i
        val piece = text.substring(pieceStart, end)
        if (piece.nonEmpty) out += piece
        first = false
        pieceStart = i // separator stays attached to the next piece
        i += separator.length
      } else i += 1
    }
    val tail = text.substring(pieceStart)
    if (tail.nonEmpty) out += tail
    out.toVector
  }

  /** Greedy merge with overlap carry — mirrors the public LangChain
    * `_merge_splits` (separator already carried inside the splits, so
    * join separator is "").
    */
  private[chunk] def mergeSplits(
      splits: Vector[String],
      chunkSize: Int,
      chunkOverlap: Int): Vector[String] = {
    val docs = ArrayBuffer.empty[String]
    var current = Vector.empty[String]
    var total = 0
    for (d <- splits) {
      val len = d.length
      if (total + len > chunkSize) {
        if (current.nonEmpty) {
          joinDocs(current).foreach(docs += _)
          // Pop from the front until within overlap budget AND the new
          // split fits.
          while (total > chunkOverlap || (total + len > chunkSize && total > 0)) {
            total -= current.head.length
            current = current.tail
          }
        }
      }
      current = current :+ d
      total += len
    }
    joinDocs(current).foreach(docs += _)
    docs.toVector
  }

  private def joinDocs(docs: Vector[String]): Option[String] = {
    val text = docs.mkString("").trim
    if (text.isEmpty) None else Some(text)
  }

  /** Full G1: concatenate snippets (space-joined, strip each), split into
    * overlapping chunks, re-associate each chunk with the greatest snippet
    * start <= the chunk's character offset (monotone forward search with
    * search-from-zero fallback), whitespace-normalize, round start to 2dp.
    */
  def chunkTranscript(
      snippets: Seq[Snippet],
      chunkSize: Int = 1000,
      chunkOverlap: Int = 200): Vector[Chunk] = {
    if (snippets.isEmpty) return Vector.empty

    val fullText = new StringBuilder
    val charToTime = ArrayBuffer.empty[(Int, Double)]
    for (sn <- snippets) {
      charToTime += ((fullText.length, sn.start))
      fullText.append(Option(sn.text).getOrElse("").trim).append(" ")
    }
    val full = fullText.toString

    val textChunks = splitText(full, chunkSize, chunkOverlap)

    val out = ArrayBuffer.empty[Chunk]
    var searchPos = 0
    for (chunkText <- textChunks) {
      var at = full.indexOf(chunkText, searchPos)
      if (at == -1) at = full.indexOf(chunkText) // fallback: search from 0
      // Greatest snippet start with char_index <= at (map is sorted).
      var startTime: Option[Double] = None
      val iter = charToTime.iterator
      var done = false
      while (iter.hasNext && !done) {
        val (ci, ts) = iter.next()
        if (ci <= at) startTime = Some(ts) else done = true
      }
      startTime.foreach { ts =>
        out += Chunk(chunkText.trim.split("\\s+").filter(_.nonEmpty).mkString(" "),
          math.rint(ts * 100) / 100)
      }
      if (at != -1) searchPos = at + 1
    }
    out.toVector
  }
}
