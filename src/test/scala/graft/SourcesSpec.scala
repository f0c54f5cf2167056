package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.Corpus
import graft.embed.HashingEmbedder
import graft.sources.{Ingest, NdJson, Store}

/** S1/S4/S5/S6/S7: persistence round-trips on real fixture data. */
class SourcesSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-src").toString

  test("NDJSON export → import round-trips rows and honors source remap") {
    val dir = tmp()
    val mem = Corpus.memories(spark, sf()).limit(50)
    NdJson.write(mem, s"$dir/export", sourcePrefix = Some("src1"))
    val back = NdJson.read(spark, s"$dir/export", sourceRemap = Some(("src1", "proj/x")))
    val n = mem.filter(col("source").startsWith("src1")).count()
    assert(back.count() == n)
    assert(back.filter(!col("source").startsWith("proj/x")).count() == 0)
    assert(back.columns.contains("text") && back.columns.contains("entity_key"))
  }

  test("NDJSON import skips malformed and text-less lines (reference validate)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.json"),
      """{"text": "valid one", "source": "src1/a"}
        |{not json at all
        |{"source": "src1/b"}
        |{"text": "", "source": "src1/c"}
        |{"text": "valid two"}
        |""".stripMargin)
    val back = NdJson.read(spark, s"$dir/in.json")
    val rows = back.select("text", "source").as[(String, String)].collect().toSet
    // malformed line, missing text and empty text are skipped; absent source
    // defaults to "imported" (memory_engine.py:2447-2530)
    assert(rows == Set(("valid one", "src1/a"), ("valid two", "imported")))
  }

  test("Store.save is write-then-swap and integrityCheck sees embeddings") {
    val dir = tmp()
    val mem = Corpus.memories(spark, sf()).limit(30)
    val n1 = Store.save(mem, s"$dir/t")
    assert(n1 == 30)
    val n2 = Store.save(mem.limit(10), s"$dir/t") // overwrite via swap
    assert(n2 == 10)
    val (total, withVec, ok) = Store.integrityCheck(Store.load(spark, s"$dir/t"))
    assert(total == 10 && withVec == 10 && ok)
  }

  test("Store.compact merges small files, keeps rows, and stays swappable") {
    val dir = tmp()
    val mem = Corpus.memories(spark, sf()).limit(40)
    Store.save(mem.repartition(8), s"$dir/t")
    val (before, after, rows) = Store.compact(spark, s"$dir/t")
    assert(before == 8 && after == 1 && rows == 40)
    // the compacted table is still a normal store: loadable and swappable
    assert(Store.load(spark, s"$dir/t").count() == 40)
    assert(Store.save(mem.limit(5), s"$dir/t") == 5)
  }

  test("snapshots keep only the newest N per prefix") {
    val dir = tmp()
    val df = Seq((1L, "a")).toDF("id", "x")
    for (i <- 1 to 5) Store.snapshot(df, dir, "pre", f"2026$i%02d", keep = 3)
    val snaps = Store.listSnapshots(dir, "pre")
    assert(snaps == Seq("pre_202603", "pre_202604", "pre_202605"))
  }

  test("rebuild-from-files: md files → chunks → embedded table") {
    val dir = tmp()
    val body = "a sufficiently long markdown paragraph body to survive the length filter"
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.md"), s"# H1\n\n$body\n\n$body")
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.md"), s"# H2\n\n$body")
    val n = Ingest.rebuildFromFiles(spark, s"$dir/*.md", HashingEmbedder(64), s"$dir/out")
    assert(n >= 2)
    val out = Store.load(spark, s"$dir/out")
    assert(out.columns.toSet == Set("id", "text", "source", "embedding"))
    assert(out.filter(size(col("embedding")) === 64).count() == n)
    assert(out.select("source").distinct().count() == 2)
  }
}
