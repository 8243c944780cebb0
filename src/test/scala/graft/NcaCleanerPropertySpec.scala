package graft

import org.apache.spark.sql.functions.lit
import org.scalacheck.{Gen, rng}
import graft.operators.NcaCleaner

/** Property-based cleaner invariants (SURVEY §5.2.3) over randomized raw
  * grids, scalacheck-generated with fixed seeds (deterministic runs, no
  * flaky CI): headers arrive permuted with extra columns, key cells have
  * gaps/nulls, amounts mix parseable and garbage — the shapes a real
  * extraction emits.
  *
  * Invariants:
  *  - every record/allocation key is non-null, non-empty; records are
  *    key-unique per doc
  *  - every allocation's key exists among the records (FK integrity by
  *    construction), every amount parsed to a real double
  *  - the program is deterministic: same grid twice -> identical output
  *  - INPUT ROW ORDER IS IMMATERIAL: the cleaner keys every window on
  *    explicit (doc, ord), so a shuffled DataFrame cleans identically
  *    (the reference's implicit-order pandas program only works because
  *    pandas never reorders — OP-39's contract made explicit)
  */
class NcaCleanerPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val extraCols = Seq("approved_date", "remarks")

  private case class Grid(header: Seq[String], rows: Seq[Seq[String]])

  private val cellGen: Gen[String] = Gen.frequency(
    3 -> Gen.oneOf("alpha", "Beta Unit", "x", "DepEd", "2024-02-01"),
    2 -> Gen.const(""),
    1 -> Gen.const(null),
    1 -> Gen.oneOf("1,200.00", "77.5", "abc", "3 000"))

  private val gridGen: Gen[Grid] = for {
    headerPerm <- Gen.delay(Gen.const(scala.util.Random.shuffle(
      NcaCleaner.ValidColumns ++ extraCols)))
    nKeys <- Gen.choose(1, 4)
    nRows <- Gen.choose(3, 18)
    keyCells <- Gen.listOfN(nRows, Gen.frequency(
      3 -> Gen.choose(1, nKeys).map(k => s"NCA-$k"),
      2 -> Gen.const(""),
      1 -> Gen.const(null)))
    cells <- Gen.listOfN(nRows, Gen.listOfN(headerPerm.length, cellGen))
  } yield Grid(
    headerPerm,
    keyCells.zip(cells).map { case (k, row) =>
      row.updated(headerPerm.indexOf("nca_number"), k)
    })

  private def grids: Seq[Grid] = (1L to 6L).map(s =>
    gridGen.pureApply(Gen.Parameters.default, rng.Seed(s)))

  private def toDf(g: Grid, shuffleSeed: Option[Long] = None) = {
    val all = (g.header +: g.rows).zipWithIndex
      .map { case (cells, i) => ("d1", i.toLong, cells) }
    val ordered = shuffleSeed.fold(all)(s => new scala.util.Random(s).shuffle(all))
    ordered.toDF("doc", "ord", "cells")
  }

  private def collectBoth(g: Grid, shuffleSeed: Option[Long] = None) = {
    val cleaned = NcaCleaner.clean(toDf(g, shuffleSeed), lit("rel-1"))
    val recs = cleaned.records.collect()
      .map(_.toSeq.map(Option(_).fold("∅")(_.toString)).mkString("|")).toSeq.sorted
    val allocs = cleaned.allocations.collect()
      .map(_.toSeq.map(Option(_).fold("∅")(_.toString)).mkString("|")).toSeq.sorted
    (recs, allocs)
  }

  test("keys non-blank and unique; allocation FK + numeric amounts hold on random grids") {
    grids.foreach { g =>
      val cleaned = NcaCleaner.clean(toDf(g), lit("rel-1"))
      val recKeys = cleaned.records.select("nca_number").as[String].collect().toSeq
      assert(recKeys.forall(k => k != null && k.trim.nonEmpty), s"blank record key in $g")
      assert(recKeys.distinct.length === recKeys.length, s"dup record key in $g")
      val allocs = cleaned.allocations
        .select("nca_number", "amount").as[(String, Double)].collect().toSeq
      assert(allocs.forall { case (k, _) => k != null && k.trim.nonEmpty })
      assert(allocs.forall { case (k, _) => recKeys.contains(k) },
        s"allocation key without record in $g")
      assert(allocs.forall { case (_, a) => !a.isNaN })
    }
  }

  test("cleaner is deterministic and invariant to input row order") {
    grids.foreach { g =>
      val base = collectBoth(g)
      assert(collectBoth(g) === base, s"nondeterministic on $g")
      assert(collectBoth(g, shuffleSeed = Some(99L)) === base,
        s"row-order sensitive on $g")
    }
  }
}
