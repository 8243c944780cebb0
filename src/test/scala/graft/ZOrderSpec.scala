package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Morton-code arithmetic (known codes, bit-exact) and the part the
  * x53 hash check cannot see: zorderWrite must actually produce
  * spatially-local files, so a 2-D box predicate prunes on parquet
  * min/max stats.
  */
class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  test("morton2: known interleavings") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.morton2($"x", $"y").as("z")).as[Long].collect().toSeq
    // (3,5): x=0b11 spreads to 0b0101=5; y=0b101 spreads to 0b010001=17,
    // odd-shifted 34; 5|34 = 39. Full 16-bit max fills 32 bits.
    assert(out === Seq(0L, 1L, 2L, 3L, 39L, 0xFFFFFFFFL))
  }

  test("morton2 is a bijection on the grid (no collisions, order-preserving per tile)") {
    val n = 64
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
    val codes = grid.toDF("x", "y").select(ZOrder.morton2($"x", $"y").as("z"))
      .as[Long].collect()
    assert(codes.distinct.length === n * n, "distinct inputs -> distinct codes")
    assert(codes.min === 0L && codes.max === n * n - 1,
      "a full power-of-two grid maps onto a dense code range")
  }

  test("zorderWrite: each output file is a spatial tile, not a stripe") {
    val n = 64
    val dir = Files.createTempDirectory("zorder").toString
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    ZOrder.zorderWrite(grid, "x", "y", numFiles = 16, path = dir)

    // per-FILE min/max of both dims — exactly the stats a reader prunes
    // on. Z-ordering 4096 cells into 16 contiguous z-ranges makes each
    // file cover ~one 16x16 tile (a range boundary may straddle two);
    // a plain x-sort would give every file the full y spread of 63.
    val perFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy($"f")
      .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
      .select($"xs", $"ys").as[(Long, Long)].collect()
    assert(perFile.length >= 8, "range partitioning must actually split the data")
    val avgArea = perFile.map { case (xs, ys) => (xs + 1) * (ys + 1) }.sum /
      perFile.length.toDouble
    assert(avgArea <= (n * n) / 4.0,
      s"files must be spatially local (avg box area $avgArea vs full ${n * n})")
    assert(perFile.forall { case (xs, ys) => xs < n - 1 || ys < n - 1 },
      "no file may span the entire grid in both dimensions")
  }
}
