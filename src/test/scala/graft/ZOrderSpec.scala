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

  test("hilbert: roundtrips against an independent inverse (d -> (x, y))") {
    // the standard d2xy walk, written independently of the forward code
    def d2xy(dIn: Long): (Long, Long) = {
      var t = dIn; var x = 0L; var y = 0L; var s = 1L
      while (s < 65536L) {
        val rx = 1L & (t / 2)
        val ry = 1L & (t ^ rx)
        if (ry == 0L) {
          if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
          val tmp = x; x = y; y = tmp
        }
        x += s * rx; y += s * ry; t /= 4; s *= 2
      }
      (x, y)
    }
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x * 937 % 65536, y * 1013 % 65536)
    pts.distinct.foreach { case (x, y) =>
      val d = graft.functions.HilbertIndex.compute(x, y)
      assert(d2xy(d) === ((x, y)), s"roundtrip at ($x, $y)")
    }
  }

  test("hilbert walk is grid-adjacent (no Morton diagonal jumps); codegen == interpreter") {
    graft.functions.GraftExtensions.register(spark)
    val n = 32
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
    // through the EXPRESSION (exercises doGenCode), sorted by index
    val walked = grid.toDF("x", "y")
      .select($"x", $"y",
        graft.functions.GraftExtensions.hilbert($"x", $"y").as("h"))
      .orderBy($"h").as[(Long, Long, Long)].collect()
    assert(walked.length === n * n)
    // codegen output must equal the interpreted twin
    walked.foreach { case (x, y, h) =>
      assert(h === graft.functions.HilbertIndex.compute(x, y))
    }
    // consecutive indexes on a full sub-grid walk are manhattan
    // neighbors — only true because 32 divides the 2^16 curve evenly
    walked.sliding(2).foreach { case Array((x1, y1, h1), (x2, y2, h2)) =>
      if (h2 === h1 + 1)
        assert(math.abs(x2 - x1) + math.abs(y2 - y1) === 1,
          s"jump between h=$h1 ($x1,$y1) and h=$h2 ($x2,$y2)")
    }
    // the sub-grid occupies the curve's dense prefix: all steps are +1
    assert(walked.last._3 === n * n - 1)
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
