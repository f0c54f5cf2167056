package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Chunker

/** S3 chunker semantics (memory_engine.py:369-421). */
class ChunkerSpec extends AnyFunSuite {

  test("header-aware: header is prepended to its section's chunk") {
    val md = "# Title\n\n" + ("alpha beta gamma delta epsilon zeta. " * 3).trim
    val chunks = Chunker.chunkMarkdown(md, "doc.md")
    assert(chunks.size == 1)
    assert(chunks.head._1.startsWith("# Title\n\n"))
    assert(chunks.head._2 == "doc.md:chunk_0")
  }

  test("short paragraphs (<20 chars) are dropped") {
    val md = "tiny\n\nalso small\n\n" +
      "this paragraph is long enough to be kept around for chunking purposes"
    val chunks = Chunker.chunkMarkdown(md, "s")
    assert(chunks.size == 1)
    assert(!chunks.head._1.contains("tiny"))
  }

  test("buffers under 30 chars are not emitted at headers or end-of-doc") {
    assert(Chunker.chunkMarkdown("# H\n\nthis is twenty chars..", "s").isEmpty)
  }

  test("short buffer carries across a header into the next section (reference fold)") {
    // expected output generated from the reference's own chunk_markdown
    // (memory_engine.py:391-396): the ≤30-char buffer is NOT cleared at the
    // header, so it lands at the front of the next section's chunk
    val md = "# A\n\nthis is twenty chars..\n\n# B\n\n" +
      "another paragraph long enough to pass the filter easily indeed"
    assert(Chunker.chunkMarkdown(md, "s") == Seq(
      ("# B\n\nthis is twenty chars..\n\nanother paragraph long enough to pass the filter easily indeed",
        "s:chunk_0")))
  }

  test("mid-chunk size-split emit has no 30-char guard (reference fold)") {
    // memory_engine.py:406-409: the size-split path emits the pending buffer
    // unconditionally — a 25-char buffer becomes its own chunk
    val md = ("x" * 25) + "\n\n" + ("y" * 1500)
    assert(Chunker.chunkMarkdown(md, "s", maxChunkSize = 700, overlapSize = 100) == Seq(
      ("x" * 25, "s:chunk_0"), ("y" * 1500, "s:chunk_1")))
  }

  test("max size split with tail overlap") {
    val para = "word " * 60 // ~300 chars each
    val md = (1 to 8).map(i => s"p$i " + para.trim).mkString("\n\n")
    val chunks = Chunker.chunkMarkdown(md, "s", maxChunkSize = 700, overlapSize = 100)
    assert(chunks.size >= 3)
    // every chunk within size bound + overlap slack
    chunks.foreach { case (text, _) => assert(text.length <= 700 + 100 + 2) }
    // overlap: the next chunk begins with the (trimmed) tail of the previous
    val first = chunks.head._1
    val second = chunks(1)._1
    assert(second.take(120).contains(first.takeRight(40).trim.take(20)))
  }

  test("multiple headers produce per-section chunks with running index") {
    val body = "a sufficiently long paragraph body to survive the length filter"
    val md = s"# One\n\n$body\n\n## Two\n\n$body\n\n### Three\n\n$body"
    val chunks = Chunker.chunkMarkdown(md, "m")
    assert(chunks.map(_._2) == Seq("m:chunk_0", "m:chunk_1", "m:chunk_2"))
    assert(chunks(0)._1.startsWith("# One"))
    assert(chunks(1)._1.startsWith("## Two"))
    assert(chunks(2)._1.startsWith("### Three"))
  }
}
