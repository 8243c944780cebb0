package graft

import graft.operators.Components

/** Connected components: known small graphs, log-round convergence on a
  * long path (the pointer-jumping property), and keep-canonical dedup.
  */
class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("chain, triangle and separate pair resolve to min-id roots") {
    val roots = cc(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain 1-2-3-4
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (20L, 21L))) // separate pair
    assert(roots === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("a 64-node path converges within the round bound (pointer jumping)") {
    val path = (0L until 63L).map(i => (i, i + 1))
    val roots = cc(path)
    assert(roots.size == 64 && roots.values.forall(_ == 0L))
  }

  test("edge direction does not matter") {
    assert(cc(Seq((5L, 3L), (3L, 9L))) === Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }

  test("empty edge list: no components, keepCanonical passes everything through") {
    assert(cc(Seq.empty) === Map.empty)
    val docs = (1L to 3L).toDF("id")
    val kept = Components.keepCanonical(docs, "id",
        Seq.empty[(Long, Long)].toDF("a", "b"))
      .as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
  }

  test("keepCanonical keeps one doc per cluster and all unpaired docs") {
    val docs = (1L to 10L).toDF("id")
    val pairs = Seq((2L, 7L), (7L, 9L), (4L, 5L)).toDF("a", "b")
    val kept = Components.keepCanonical(docs, "id", pairs)
      .as[Long].collect().toSet
    // clusters {2,7,9} -> keep 2; {4,5} -> keep 4; others untouched
    assert(kept === Set(1L, 2L, 3L, 4L, 6L, 8L, 10L))
  }
}
