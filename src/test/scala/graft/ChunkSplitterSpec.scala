package graft

import graft.chunk.{Chunk, ChunkSplitter, Snippet}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class ChunkSplitterSpec extends AnyFunSuite {

  test("splitText: text under chunk size returns one chunk") {
    assert(ChunkSplitter.splitText("a b c", 5, 2) == Vector("a b c"))
  }

  test("splitText: greedy merge without overlap when splits exceed budget") {
    assert(ChunkSplitter.splitText("aa bb cc dd", 5, 2) ==
      Vector("aa bb", "cc", "dd"))
  }

  test("splitText: overlap carries trailing context into next chunk") {
    assert(ChunkSplitter.splitText("aaa bbb ccc", 8, 4) ==
      Vector("aaa bbb", "bbb ccc"))
  }

  test("splitText: prefers paragraph then newline separators") {
    val text = "para one line\n\npara two line"
    assert(ChunkSplitter.splitText(text, 15, 0) ==
      Vector("para one line", "para two line"))
  }

  test("splitText: oversized single word falls through to char split") {
    val word = "x" * 25
    val out = ChunkSplitter.splitText(word, 10, 0)
    assert(out.forall(_.length <= 10))
    assert(out.mkString == word)
  }

  test("chunkTranscript: empty input") {
    assert(ChunkSplitter.chunkTranscript(Nil) == Vector.empty)
  }

  test("chunkTranscript: golden small example with timestamp re-association") {
    val snippets = Seq(
      Snippet("Hello world", 0.0, 5.0),
      Snippet("this is a test", 5.5, 4.0),
      Snippet("of chunking", 10.1, 3.0))
    val out = ChunkSplitter.chunkTranscript(snippets, chunkSize = 12, chunkOverlap = 4)
    assert(out == Vector(
      Chunk("Hello world", 0.0),
      Chunk("this is a", 5.5),
      Chunk("a test of", 5.5),
      Chunk("of chunking", 10.1)))
  }

  test("chunkTranscript: start times round to 2dp") {
    val out = ChunkSplitter.chunkTranscript(Seq(Snippet("hi", 1.23456, 1.0)))
    assert(out == Vector(Chunk("hi", 1.23)))
  }

  // ---- seeded property-style tests (deterministic, 50 cases each) ----

  private def randomSnippets(rnd: Random, n: Int): Seq[Snippet] = {
    var t = 0.0
    (0 until n).map { _ =>
      val words = (0 until 1 + rnd.nextInt(12)).map { _ =>
        (0 until 1 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }
      t += rnd.nextInt(500) / 100.0
      Snippet(words.mkString(" "), t, 2.0)
    }
  }

  private def cases(body: Seq[Snippet] => Unit): Unit = {
    val rnd = new Random(42)
    (0 until 50).foreach { _ => body(randomSnippets(rnd, 1 + rnd.nextInt(20))) }
  }

  test("property: every chunk start is one of the snippet starts") {
    cases { sns =>
      val starts = sns.map(s => math.rint(s.start * 100) / 100).toSet
      val chunks = ChunkSplitter.chunkTranscript(sns, 80, 20)
      assert(chunks.forall(c => starts.contains(c.start)))
    }
  }

  test("property: chunk starts are monotonically non-decreasing") {
    cases { sns =>
      val chunks = ChunkSplitter.chunkTranscript(sns, 80, 20)
      assert(chunks.map(_.start) == chunks.map(_.start).sorted)
    }
  }

  test("property: every chunk text appears in the normalized full text") {
    cases { sns =>
      val full = sns.map(_.text.trim).mkString(" ") + " "
      val norm = full.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      val chunks = ChunkSplitter.chunkTranscript(sns, 80, 20)
      assert(chunks.forall(c => norm.contains(c.text)))
    }
  }

  test("property: chunks cover every input word (no data loss)") {
    cases { sns =>
      val allWords = sns.flatMap(_.text.split("\\s+")).filter(_.nonEmpty)
      val chunkWords = ChunkSplitter.chunkTranscript(sns, 60, 15)
        .flatMap(_.text.split(" "))
      assert(allWords.toSet.subsetOf(chunkWords.toSet))
    }
  }

  test("reference behavioral case (test_transcript.py chunk_size=50, overlap=20)") {
    val snippets = Seq(
      Snippet("This is the first sentence.", 0.0, 2.0),
      Snippet("This is the second sentence that provides overlap.", 2.0, 3.0),
      Snippet("This is the third and final sentence.", 5.0, 2.5))
    val chunks = ChunkSplitter.chunkTranscript(snippets, chunkSize = 50, chunkOverlap = 20)
    assert(chunks.length > 1)
    assert(chunks.head.start == 0.0)
    assert(chunks.last.text.contains("final sentence"))
    assert(chunks.last.start >= 2.0)
  }
}
