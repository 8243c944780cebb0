package graft

import java.io.File
import java.nio.file.Files
import graft.sinks.TableStore

class TableStoreSpec extends SparkSpecBase {
  import spark.implicits._

  test("upsert inserts then last-writer-wins on key, idempotently") {
    val dir = Files.createTempDirectory("ts").toString + "/t"
    TableStore.upsert(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir, "k")
    TableStore.upsert(Seq((2, "B2"), (3, "c")).toDF("k", "v"), dir, "k")
    val expect = Set((1, "a"), (2, "B2"), (3, "c"))
    def state = TableStore.read(spark, dir).get.as[(Int, String)].collect().toSet
    assert(state === expect)
    // idempotent replay of the same batch
    TableStore.upsert(Seq((2, "B2"), (3, "c")).toDF("k", "v"), dir, "k")
    assert(state === expect)
  }

  test("upsert dedupes duplicate keys inside one batch, keep-LAST (later chunk wins)") {
    val dir = Files.createTempDirectory("ts2").toString + "/t"
    // same key twice in one batch: descending all-column order keeps ("y")
    TableStore.upsert(Seq((1, "x"), (1, "y")).toDF("k", "v"), dir, "k")
    assert(TableStore.read(spark, dir).get.as[(Int, String)].collect().toSet
      === Set((1, "y")))
  }

  test("a null-key row is REPLACED on re-upsert, not appended forever") {
    val dir = Files.createTempDirectory("tsnull").toString + "/t"
    val rows1 = Seq((Some(1), "a"), (None, "n1"))
      .toDF("k", "v").select($"k".cast("int").as("k"), $"v")
    TableStore.upsert(rows1, dir, "k")
    val rows2 = Seq((Some(1), "a2"), (None, "n2"))
      .toDF("k", "v").select($"k".cast("int").as("k"), $"v")
    TableStore.upsert(rows2, dir, "k")
    // plain === key equality would never match the existing null row:
    // every upsert would append another one
    val state = TableStore.read(spark, dir).get
      .as[(Option[Int], String)].collect().toSet
    assert(state === Set((Some(1), "a2"), (None, "n2")))
  }

  test("reserved working column names are refused up front") {
    val dir = Files.createTempDirectory("tsres").toString + "/t"
    val bad = Seq((1, 2)).toDF("k", "__b")
    val e = intercept[IllegalArgumentException] {
      TableStore.upsert(bad, dir, "k")
    }
    assert(e.getMessage.contains("__b"))
    intercept[IllegalArgumentException] {
      TableStore.append(Seq((1, 2)).toDF("k", "__rn"), dir)
    }
  }

  test("upsert rewrites only buckets containing batch keys (others byte-identical)") {
    val dir = Files.createTempDirectory("ts4").toString + "/t"
    // many keys spread over all buckets
    TableStore.upsert((1 to 500).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k")
    val before = bucketFileState(dir)
    assert(before.size > 1, "expected a multi-bucket layout")
    // single-key upsert touches exactly the buckets of its keys
    TableStore.upsert(Seq((42, "UPDATED")).toDF("k", "v"), dir, "k")
    val after = bucketFileState(dir)
    val changed = after.keySet.filter(b => before.get(b) != after.get(b)) ++
      before.keySet.diff(after.keySet)
    assert(changed.size === 1, s"only one bucket may change, got $changed")
    // content still correct
    val all = TableStore.read(spark, dir).get.as[(Int, String)].collect().toMap
    assert(all.size === 500 && all(42) === "UPDATED" && all(41) === "v41")
  }

  /** bucket dir -> sorted (file name, size, md5) fingerprint. */
  private def bucketFileState(dir: String): Map[String, Seq[(String, Long, String)]] =
    new File(dir).listFiles().filter(f => f.isDirectory && f.getName.matches("b\\d{4}"))
      .map { b =>
        val files = b.listFiles().filter(_.isFile).sortBy(_.getName).toSeq
          .map { f =>
            val bytes = Files.readAllBytes(f.toPath)
            val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
              .map("%02x".format(_)).mkString
            (f.getName, f.length(), md5)
          }
        b.getName -> files
      }.toMap

  test("append accumulates; deleteCascade removes parent and child rows") {
    val base = Files.createTempDirectory("ts3").toString
    val parent = s"$base/release"
    val child = s"$base/record"
    TableStore.upsert(Seq(("r1", 2024), ("r2", 2025)).toDF("id", "year"), parent, "id")
    TableStore.append(Seq(("n1", "r1"), ("n2", "r1"), ("n3", "r2"))
      .toDF("nca", "release_id"), child)
    TableStore.deleteCascade(spark, Seq("r1").toDF("id"), "id",
      parent = (parent, "id"), children = Seq((child, "release_id")))
    assert(TableStore.read(spark, parent).get.as[(String, Int)].collect().toSet
      === Set(("r2", 2025)))
    assert(TableStore.read(spark, child).get.as[(String, String)].collect().toSet
      === Set(("n3", "r2")))
  }

  test("deleteCascade on a bucketed table leaves unmatched buckets untouched") {
    val dir = Files.createTempDirectory("ts5").toString + "/t"
    TableStore.upsert((1 to 500).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k")
    val before = bucketFileState(dir)
    TableStore.deleteCascade(spark, Seq(42).toDF("k"), "k", parent = (dir, "k"))
    val after = bucketFileState(dir)
    val changed = after.keySet.filter(b => before.get(b) != after.get(b)) ++
      before.keySet.diff(after.keySet)
    assert(changed.size === 1, s"only one bucket may change, got $changed")
    assert(TableStore.read(spark, dir).get.count() === 499)
  }

  test("lookup probes a single bucket and survives literal width mismatch") {
    val dir = Files.createTempDirectory("ts7").toString + "/t"
    TableStore.upsert((1 to 500).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k")
    assert(TableStore.lookup(spark, dir, "k", 42).get
      .as[(Int, String)].collect().toSeq === Seq((42, "v42")))
    // a long literal against an int key must still hash to the right bucket
    assert(TableStore.lookup(spark, dir, "k", 42L).get
      .as[(Int, String)].collect().toSeq === Seq((42, "v42")))
    assert(TableStore.lookup(spark, dir, "k", 9999).get.isEmpty)
    // single-bucket proof: remove every bucket dir EXCEPT the key's —
    // the lookup must not notice
    val keyBucket = TableStore.lookup(spark, dir, "k", 42).get
      .inputFiles.head.replaceAll(".*/(b\\d{4})/.*", "$1")
    new File(dir).listFiles().filter(f => f.isDirectory && f.getName != keyBucket)
      .foreach(f => { def rm(x: File): Unit = { Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); }; rm(f) })
    assert(TableStore.lookup(spark, dir, "k", 42).get
      .as[(Int, String)].collect().toSeq === Seq((42, "v42")))
  }

  test("upsert folds a legacy flat append layout into buckets") {
    val dir = Files.createTempDirectory("ts6").toString + "/t"
    TableStore.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir)
    TableStore.upsert(Seq((2, "B2"), (3, "c")).toDF("k", "v"), dir, "k")
    assert(TableStore.read(spark, dir).get.as[(Int, String)].collect().toSet
      === Set((1, "a"), (2, "B2"), (3, "c")))
    // flat files are gone — the table is fully bucketed now
    assert(!new File(dir).listFiles().exists(f =>
      f.isFile && f.getName.endsWith(".parquet")))
  }

  test("append chunkRows bounds rows per output file (OP-44, DB_BULK_SIZE analog)") {
    val dir = Files.createTempDirectory("ts7").toString + "/t"
    TableStore.append((1 to 1200).toDF("k").coalesce(1), dir, chunkRows = 500)
    val files = new File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val counts = files.map(f => spark.read.parquet(f.getPath).count()).sorted.toSeq
    assert(counts.forall(_ <= 500), s"file over chunk bound: $counts")
    assert(counts.sum === 1200)
    assert(files.length >= 3)
  }

  test("recover: an orphaned bucket backup is restored on the next read") {
    val dir = Files.createTempDirectory("tsrec").toString + "/t"
    TableStore.upsert((1 to 200).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k")
    // simulate a crash between swapIn's backup and promote steps: the
    // live bucket dir is gone, its only copy sits in .bak
    val buckets = new File(dir).listFiles().filter(_.getName.matches("b\\d+"))
    val victim = buckets.head
    val bak = new File(dir, victim.getName + ".bak")
    assert(victim.renameTo(bak))
    // without recovery this read would silently miss the bucket's rows
    assert(TableStore.read(spark, dir).get.count() === 200)
    assert(!bak.exists(), "backup must be promoted back to live")
  }

  test("recover: interrupted flat rewrite rolls back without the swap marker") {
    val dir = Files.createTempDirectory("tsrec2").toString + "/t"
    TableStore.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), dir)
    // simulate a crash AFTER old files moved to backup, BEFORE the
    // marker: old data must come back, staging must be discarded
    val flat = new File(dir).listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val bakDir = new File(dir + ".flatbak"); bakDir.mkdirs()
    flat.foreach(f => assert(f.renameTo(new File(bakDir, f.getName))))
    new File(dir + ".flatstaging").mkdirs()
    assert(TableStore.read(spark, dir).get.count() === 3,
      "rollback must restore the backed-up flat files")
    assert(!bakDir.exists() && !new File(dir + ".flatstaging").exists())
  }

  test("recover: interrupted flat rewrite rolls forward with the swap marker") {
    val dir = Files.createTempDirectory("tsrec3").toString + "/t"
    TableStore.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), dir)
    // a committed rewrite (marker present) whose staged survivors were
    // not yet moved in: recovery must promote them and drop the backup
    val flat = new File(dir).listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val bakDir = new File(dir + ".flatbak"); bakDir.mkdirs()
    flat.foreach(f => assert(f.renameTo(new File(bakDir, f.getName))))
    val staging = new File(dir + ".flatstaging").toString
    Seq((1, "a")).toDF("k", "v").write.parquet(staging) // the survivors
    Files.write(new File(dir, "_graft_swap").toPath, Array.emptyByteArray)
    assert(TableStore.read(spark, dir).get.as[(Int, String)].collect().toSet
      === Set((1, "a")), "roll-forward must keep only the staged survivors")
    assert(!bakDir.exists() && !new File(dir, "_graft_swap").exists())
  }

  test("deleteCascade flat rewrite survives and stays correct end to end") {
    val dir = Files.createTempDirectory("tsrec4").toString + "/t"
    TableStore.append((1 to 10).map(i => (i, s"v$i")).toDF("k", "v"), dir)
    TableStore.deleteCascade(spark, Seq(3, 7).toDF("k"), "k", parent = (dir, "k"))
    assert(TableStore.read(spark, dir).get.as[(Int, String)].collect().map(_._1).toSet
      === (1 to 10).toSet -- Set(3, 7))
    // no protocol droppings left behind
    assert(!new File(dir + ".flatbak").exists())
    assert(!new File(dir + ".flatstaging").exists())
    assert(!new File(dir, "_graft_swap").exists())
  }

  test("requireNonEmpty guards empty bulk writes") {
    intercept[IllegalArgumentException] {
      TableStore.requireNonEmpty(Seq.empty[Int].toDF("x"), "records")
    }
  }
}
