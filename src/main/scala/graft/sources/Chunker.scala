package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3/S4: markdown-aware chunking + rebuild-from-files ingest
  * (reference memory_engine.py:369-421, 2699-2764).
  *
  * The chunker itself is a pure Scala function (header-aware splitter,
  * max 1500 chars, 200-char tail overlap, short-paragraph drop) — the same
  * stateful fold the reference runs per document. Distribution comes from
  * where it runs: a deterministic scalar applied per row via `explode` over
  * a split/fold expression would lose the cross-paragraph buffer state, so
  * the per-document fold runs inside a Dataset map — one document is the
  * unit of parallelism, which is exactly how a 100 TB ingest shards.
  */
object Chunker {

  /** Pure chunker: (chunkText, "source:chunk_i") pairs. Port of
    * memory_engine.py:369-421 semantics. */
  def chunkMarkdown(content: String, sourceName: String,
                    maxChunkSize: Int = 1500, overlapSize: Int = 200): Seq[(String, String)] = {
    // split preserving header delimiters, matching the reference's
    // re.split(r"(^#{1,4}\s+.+$)", ..., MULTILINE) capture semantics
    val headerRe = "(?m)^#{1,4}\\s+.+$".r
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var last = 0
    for (m <- headerRe.findAllMatchIn(content)) {
      pieces += content.substring(last, m.start)
      pieces += m.matched
      last = m.end
    }
    pieces += content.substring(last)

    val chunks = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var currentHeader = ""
    var buffer = ""
    var chunkIdx = 0

    def emitText(b: String): Unit = {
      val text = if (currentHeader.nonEmpty) s"$currentHeader\n\n$b" else b
      chunks += ((text, s"$sourceName:chunk_$chunkIdx"))
      chunkIdx += 1
    }

    // header/final emit: >30-char guard; the buffer is cleared ONLY when the
    // chunk was actually emitted, so a short buffer carries across headers
    // (memory_engine.py:391-396)
    def emitGuarded(): Unit = {
      val b = buffer.trim
      if (b.nonEmpty && b.length > 30) {
        emitText(b)
        buffer = ""
      }
    }

    for (part0 <- pieces; part = part0.trim if part.nonEmpty) {
      if (part.matches("(?s)^#{1,4}\\s+.*")) {
        emitGuarded()
        currentHeader = part
      } else {
        for (para0 <- part.split("\n\\s*\n"); para = para0.trim
             if para.nonEmpty && para.length >= 20) {
          val candidate = if (buffer.nonEmpty) s"$buffer\n\n$para".trim else para
          if (candidate.length > maxChunkSize && buffer.nonEmpty) {
            // mid-chunk size-split emit has NO length guard in the reference
            // (memory_engine.py:406-409) — buffer is non-empty here by the
            // branch condition
            emitText(buffer.trim)
            buffer =
              if (buffer.length > overlapSize)
                buffer.takeRight(overlapSize) + "\n\n" + para
              else para
          } else buffer = candidate
        }
      }
    }
    emitGuarded()
    chunks.toSeq
  }

  /** Distributed ingest: (source, content) rows → one row per chunk with
    * chunked source keys. The fold runs per document inside the executors. */
  def chunkDocuments(docs: DataFrame, maxChunkSize: Int = 1500,
                     overlapSize: Int = 200): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source").cast("string"), col("content").cast("string"))
      .as[(String, String)]
      .flatMap { case (source, content) =>
        chunkMarkdown(content, source, maxChunkSize, overlapSize)
      }
      .toDF("text", "chunk_source")
  }
}
