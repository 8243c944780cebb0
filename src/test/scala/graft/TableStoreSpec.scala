package graft

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

  test("upsert dedupes duplicate keys inside one batch deterministically") {
    val dir = Files.createTempDirectory("ts2").toString + "/t"
    TableStore.upsert(Seq((1, "x"), (1, "y")).toDF("k", "v"), dir, "k")
    assert(TableStore.read(spark, dir).get.count() === 1)
  }

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

  test("requireNonEmpty guards empty bulk writes") {
    intercept[IllegalArgumentException] {
      TableStore.requireNonEmpty(Seq.empty[Int].toDF("x"), "records")
    }
  }
}
