package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions

/** Similarity search over embedding columns (array<float>).
  *
  * All scoring goes through the native codegen'd [[graft.functions.VecDot]]
  * expression (a tight primitive loop inside whole-stage codegen — the
  * HOF zip_with/aggregate formulation measured ~50x slower at pairwise
  * scale). Norms are computed once per vector (O(N)) and reused across
  * all O(N^2)/bucketed comparisons.
  *
  * Brute-force cosine top-k is the correctness baseline; the LSH
  * (random-hyperplane) bucketed variant is the 100 TB scale path — each
  * vector lands in one bucket, and only bucket collisions are scored,
  * turning the O(N*Q) cross join into a per-bucket join.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column = GraftExtensions.vecDot(a, b)

  /** (id, vec, nrm) projection with the L2 norm precomputed once.
    * Zero-norm vectors (padding rows, failed embeddings) are EXCLUDED:
    * cosine against them is 0/0 = NaN, and Spark orders NaN above every
    * real number — one zero vector would out-rank the true #1 neighbor
    * in every top-k and pass every >= threshold filter. A directionless
    * vector has no legitimate cosine neighbors, so dropping it is the
    * well-defined semantic.
    */
  private def withNorm(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    GraftExtensions.register(vecs.sparkSession)
    vecs.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", sqrt(dot(col("vec"), col("vec"))))
      // NaN components (failed embeddings) make the norm NaN, and Spark
      // orders NaN ABOVE every number — `> 0` alone would let a NaN
      // cosine out-rank every true neighbor. Exclude both degenerate
      // shapes here, once, for every caller.
      .filter(col("nrm") > 0 && !isnan(col("nrm")))
  }

  /** Pairwise cosine >= threshold between all vectors (a < b). Exact but
    * cross-join based — ONLY for bounded candidate sets (e.g. verifying
    * candidates another blocker produced). The corpus-scale entry point
    * is [[cosinePairsBucketed]].
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
    v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        round(dot(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Near-dup cosine pairs at corpus scale: candidates come from
    * multi-table random-hyperplane LSH bucket collisions (union of L
    * independent tables — AND over nbits within a table, OR across
    * tables), then only collided pairs are scored exactly. Never a
    * cross join: each table's join is per-bucket. Recall for a pair at
    * cosine s is 1-(1-p^nbits)^tables with p = 1-acos(s)/π; identical
    * vectors always collide (every table), so exact-duplicate detection
    * is lossless at any setting.
    */
  def cosinePairsBucketed(vecs: DataFrame, idCol: String, vecCol: String,
                          threshold: Double, nbits: Int = 8,
                          tables: Int = 8): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    val v = withNorm(vecs, idCol, vecCol)
    // one dim probe + one sign collect, shared by bucketing (the
    // per-input duplicate driver round-trips were pure waste); buckets
    // derive from the already-filtered normed frame
    // eager localCheckpoint of the BUCKET relation only (3 longs/row):
    // it feeds both sides of the self-join below, and recomputing it
    // means re-running tables*nbits VecDots per vector per side.
    // The vector relation v is deliberately NOT checkpointed — at
    // corpus scale pinning every embedding in executor storage is the
    // failure mode; its re-scans are parallel parquet reads.
    val b = (dimOf(v) match {
      case None => v.select(col("id"), lit(0).as("table"), lit(0L).as("bucket")).limit(0)
      case Some(dim) =>
        val signs = hyperplaneSigns(vecs.sparkSession, dim, 0 until tables * nbits)
        bucketsFromSigns(v, signs, nbits, tables)
          .select(col("id"), col("table"), col("bucket"))
    }).localCheckpoint(true)
    val candidates = b.as("x").join(b.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    candidates
      .join(v.select(col("id").as("a"), col("vec").as("va"), col("nrm").as("na")), "a")
      .join(v.select(col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb")), "b")
      .select(col("a"), col("b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Multi-table LSH bucket relation (id, table, bucket) of a vector
    * frame — the PERSISTABLE candidate-generation half of a semantic
    * near-dup index. The hyperplanes are deterministic hash functions
    * of (seed, dimension index), so a batch arriving months later
    * buckets identically with no stored hyperplane state; only this
    * relation and the (id, vec, nrm) verification relation
    * ([[normedVecs]]) need to live in storage.
    */
  def lshBucketTable(vecs: DataFrame, idCol: String, vecCol: String,
                     nbits: Int, tables: Int): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    val v = withNorm(vecs, idCol, vecCol)
    dimOf(v) match {
      case None => v.select(col("id"), lit(0).as("table"), lit(0L).as("bucket")).limit(0)
      case Some(dim) =>
        val signs = hyperplaneSigns(vecs.sparkSession, dim, 0 until tables * nbits)
        bucketsFromSigns(v, signs, nbits, tables)
          .select(col("id"), col("table"), col("bucket"))
    }
  }

  /** The verification half of the stored semantic index: (id, vec, nrm),
    * norms precomputed so batch-time verification never rescans to
    * re-derive them.
    */
  def normedVecs(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    withNorm(vecs, idCol, vecCol)

  /** Incremental cosine near-dup pairs: a NEW vector batch against a
    * STORED index (bucket relation + normed-vector relation), plus
    * in-batch pairs — never old-vs-old, so per-batch cost is the batch's
    * bucket computation + one bucket-keyed join against the index (the
    * x34 growing-corpus contract applied to embeddings). Output
    * (a, b, sim): `b` is always a batch id; `a` is an index id
    * (new-vs-index) or a smaller batch id (in-batch).
    */
  def incrementalCosinePairsFromIndex(
      indexBuckets: DataFrame, indexVecs: DataFrame, newVecs: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nbits: Int, tables: Int): DataFrame = {
    val nv = withNorm(newVecs, idCol, vecCol)
    val nb = lshBucketTable(newVecs, idCol, vecCol, nbits, tables)
      .localCheckpoint(true)
    val vsIndex = nb.as("y")
      .join(indexBuckets.as("x"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
    val inBatch = nb.as("x").join(nb.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
    val candidates = vsIndex.unionByName(inBatch).distinct()
    // verify: the a side may live in the index OR the batch; serve both
    // from one union so each candidate scores exactly once
    val allVecs = indexVecs.select(col("id"), col("vec"), col("nrm"))
      .unionByName(nv.select(col("id"), col("vec"), col("nrm")))
      // an id present in both (a replayed batch) must not double-score
      .groupBy(col("id")).agg(first(col("vec")).as("vec"), first(col("nrm")).as("nrm"))
    candidates
      .join(allVecs.select(col("id").as("a"), col("vec").as("va"), col("nrm").as("na")), "a")
      .join(nv.select(col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb")), "b")
      .select(col("a"), col("b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Brute-force cosine top-k neighbors for each query vector.
    * Deterministic: ties broken by neighbor id after rounding.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val c = withNorm(corpus, idCol, vecCol)
      .select(col("id").as("nid"), col("vec").as("nvec"), col("nrm").as("nnrm"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** ±1 hyperplane components for each seed, PRECOMPUTED once on the
    * driver by evaluating the defining expression — h[seed][d] = +1 iff
    * xxhash64(seed, d) is even — in one tiny job over `dim` rows. The
    * signs are then baked into literal arrays, so per-vector bucketing
    * is `tables*nbits` codegen'd VecDot calls instead of
    * `tables*nbits*dim` per-element xxhash64 evaluations (the round-2
    * constant-factor sink). Buckets are bit-identical to the inline
    * formulation: same hash values, same ±1, same left-to-right double
    * accumulation order in VecDot as the aggregate() HOF had.
    */
  private def hyperplaneSigns(spark: org.apache.spark.sql.SparkSession,
                              dim: Int, seeds: Seq[Int]): Map[Int, Seq[Double]] = {
    // d must stay IntegerType: the old inline form hashed the elements of
    // sequence(0, size-1) (int), and xxhash64 of int vs long differ.
    val rows = spark.range(dim)
      .select(col("id").cast("int").as("d"),
        array(seeds.map(sd =>
          when(xxhash64(lit(sd), col("id").cast("int")) % 2 === 0, 1.0)
            .otherwise(-1.0)): _*).as("signs"))
      .collect()
      .sortBy(_.getInt(0))
    seeds.zipWithIndex.map { case (sd, i) =>
      sd -> rows.map(_.getSeq[Double](1)(i)).toIndexedSeq
    }.toMap
  }

  /** Dimension of the embedding column (first row; assumes the uniform
    * dimension any real embedding column has). None when empty.
    */
  private def dimOf(v: DataFrame): Option[Int] =
    v.select(size(col("vec"))).take(1).headOption.map(_.getInt(0))

  /** Random-hyperplane LSH bucket id (nbits-bit signature) per vector.
    * Hyperplane h[p][d] is a deterministic pseudo-random +-1 derived from
    * xxhash64(seed, d) — no RNG state, fully reproducible across
    * runs/nodes. `table` offsets the seeds so L independent tables can
    * be derived from the same formula (table 0 = the original set).
    */
  def lshBuckets(vecs: DataFrame, idCol: String, vecCol: String,
                 nbits: Int, table: Int = 0): DataFrame = {
    GraftExtensions.register(vecs.sparkSession)
    val v = vecs.select(col(idCol).as("id"), col(vecCol).as("vec"))
    dimOf(v) match {
      case None => v.withColumn("bucket", lit(0L)).limit(0)
      case Some(dim) =>
        val seeds = (0 until nbits).map(p => table * nbits + p)
        val signs = hyperplaneSigns(vecs.sparkSession, dim, seeds)
        val bucketBits = (0 until nbits).map { p =>
          val dotp = dot(col("vec"), typedlit(signs(table * nbits + p)))
          when(dotp > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
        }
        // foldLeft, not reduce: nbits=0 (single bucket = exhaustive
        // search) is a valid configuration and must not throw
        v.withColumn("bucket", bucketBits.foldLeft(lit(0L))((a, b) => a.bitwiseOR(b)))
    }
  }

  /** Per-table bucket signatures over a (id, vec, ...) frame with the
    * sign maps already in hand — the single implementation every
    * multi-table caller shares, so the dim probe and the driver-side
    * sign collect run ONCE per operator, not once per input.
    */
  private def bucketsFromSigns(v: DataFrame, signs: Map[Int, Seq[Double]],
                               nbits: Int, tables: Int): DataFrame = {
    def bucketFor(t: Int) = {
      val bits = (0 until nbits).map { p =>
        val dotp = dot(col("vec"), typedlit(signs(t * nbits + p)))
        when(dotp > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }
      bits.foldLeft(lit(0L))((a, b) => a.bitwiseOR(b))
    }
    // posexplode_outer + not-null (see Dedup.shingleTable): the inner
    // form would infer a size(...)>0 filter inlining all tables*nbits
    // VecDot bucket computations below any upstream exchange
    v.select(col("id"), col("vec"),
        posexplode_outer(array((0 until tables).map(bucketFor): _*)))
      .filter(col("pos").isNotNull)
      .select(col("id"), col("vec"), col("pos").as("table"), col("col").as("bucket"))
  }

  /** L independent LSH tables in one frame: (id, table, bucket) — one
    * row per (vector, table). OR-amplification across tables: a pair is
    * a candidate when it collides in ANY table. The per-table signatures
    * are computed in a single projection (no explode of the vector).
    */
  def lshBucketsMulti(vecs: DataFrame, idCol: String, vecCol: String,
                      nbits: Int, tables: Int): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    GraftExtensions.register(vecs.sparkSession)
    val v = vecs.select(col(idCol).as("id"), col(vecCol).as("vec"))
    dimOf(v) match {
      case None =>
        v.select(col("id"), col("vec"), lit(0).as("table"), lit(0L).as("bucket")).limit(0)
      case Some(dim) =>
        val signs = hyperplaneSigns(vecs.sparkSession, dim, 0 until tables * nbits)
        bucketsFromSigns(v, signs, nbits, tables)
    }
  }

  /** IVF (inverted-file) coarse quantization: nlist centroids are a
    * deterministic pseudo-random corpus sample (ordered by xxhash64(id)
    * — no RNG state; production would refine with k-means‖, which only
    * moves centroids, not the algorithm). Every vector is assigned to
    * its `take` highest-cosine centroids; the window is per-vector, the
    * centroid side broadcasts (nlist is small by construction).
    */
  private def ivfAssign(v: DataFrame, centroids: DataFrame, take: Int): DataFrame = {
    val scored = v.crossJoin(broadcast(centroids))
      .select(col("id"), col("vec"), col("nrm"), col("cell"),
        (dot(col("vec"), col("cvec")) / (col("nrm") * col("cnrm"))).as("csim"))
    val w = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cell"))
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= take)
      .select(col("id"), col("vec"), col("nrm"), col("cell"))
  }

  /** ANN top-k via IVF: score only the corpus cells nearest the query.
    * Candidates per query ≈ nprobe/nlist of the corpus — the classic
    * accuracy/cost dial (nprobe = nlist degenerates to exact brute force,
    * asserted in the spec; precision — every emitted score appears in
    * the exhaustive relation — is gated by the declared empty-set oracle
    * x16p). Complements [[lshTopK]]: IVF adapts to the data's cluster
    * structure where hyperplane LSH is data-oblivious.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int, nlist: Int,
              nprobe: Int): DataFrame =
    ivfSearch(ivfBuild(corpus, idCol, vecCol, nlist), queries,
      idCol, vecCol, k, nprobe)

  /** The two PERSISTABLE halves of an IVF index — both plain parquet
    * shapes: `centroids` (cell, cvec, cnrm — nlist rows) and
    * `assignments` (nid, nvec, nnrm, cell — one row per corpus vector,
    * cell-keyed for probe-side pruning). The build-once / search-many
    * deployment writes both and serves every later query batch from
    * storage ([[ivfSearch]]) — the ANN mirror of the dedup family's
    * stored band index.
    */
  final case class IvfIndex(centroids: DataFrame, assignments: DataFrame)

  def ivfBuild(corpus: DataFrame, idCol: String, vecCol: String,
               nlist: Int): IvfIndex = {
    require(nlist >= 1, "nlist must be >= 1")
    val c = withNorm(corpus, idCol, vecCol)
    // nlist rows: the global window is over a bounded tiny frame
    val wSeed = Window.orderBy(xxhash64(col("id")))
    val centroids = c.orderBy(xxhash64(col("id"))).limit(nlist)
      .withColumn("cell", row_number().over(wSeed))
      .select(col("cell"), col("vec").as("cvec"), col("nrm").as("cnrm"))
    val assign = ivfAssign(c, centroids, take = 1)
      .select(col("id").as("nid"), col("vec").as("nvec"),
        col("nrm").as("nnrm"), col("cell"))
    IvfIndex(centroids, assign)
  }

  /** A refined index plus the summed-cosine objective measured at each
    * assignment (length iters + 1: seed assignment through final).
    */
  final case class IvfRefined(index: IvfIndex, objectives: Seq[Double])

  /** [[ivfAssign]] take=1 with the winning cosine retained — the
    * objective's per-vector term.
    */
  private def ivfAssignScored(v: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = v.crossJoin(broadcast(centroids))
      .select(col("id"), col("vec"), col("nrm"), col("cell"),
        (dot(col("vec"), col("cvec")) / (col("nrm") * col("cnrm"))).as("csim"))
    val w = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cell"))
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= 1)
      .select(col("id"), col("vec"), col("nrm"), col("cell"), col("csim"))
  }

  /** Lloyd-refined IVF build — spherical k-means over the hash-seeded
    * centroids: `iters` rounds of assign → recompute, each new centroid
    * the mean of its members' UNIT vectors (assignment sees direction
    * only, and normalizing before the mean is what makes every round
    * non-decreasing in summed cosine — the spherical-k-means guarantee
    * the x56g gate checks). Scale shape per round: one broadcast
    * assign (centroids are nlist rows), one (cell, pos)
    * map-side-combinable average over dim×N exploded rows — the
    * standard distributed k-means shuffle — and a 1-row objective
    * collect. Cells that lose every member keep their previous
    * centroid, so nlist never shrinks. Centroids are array<double>
    * from the seed on (the mean is double anyway; vec_dot takes
    * float/double mixes natively).
    */
  def ivfBuildRefined(corpus: DataFrame, idCol: String, vecCol: String,
                      nlist: Int, iters: Int): IvfRefined = {
    require(nlist >= 1, "nlist must be >= 1")
    require(iters >= 0, "iters must be >= 0")
    val c = withNorm(corpus, idCol, vecCol).localCheckpoint(true)
    val wSeed = Window.orderBy(xxhash64(col("id")))
    var centroids = c.orderBy(xxhash64(col("id"))).limit(nlist)
      .withColumn("cell", row_number().over(wSeed))
      .select(col("cell"),
        transform(col("vec"), x => x.cast("double")).as("cvec"),
        col("nrm").as("cnrm"))
      .localCheckpoint(true)
    val objs = Seq.newBuilder[Double]
    var assign = ivfAssignScored(c, centroids).localCheckpoint(true)
    objs += assign.agg(sum(col("csim"))).head().getDouble(0)
    (1 to iters).foreach { _ =>
      val means = assign
        .select(col("cell"), posexplode(transform(col("vec"), x => x / col("nrm"))))
        .groupBy(col("cell"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("ncvec"))
        .withColumn("ncnrm", sqrt(dot(col("ncvec"), col("ncvec"))))
        // a cell whose members cancel to ~zero has no direction: keep old
        .filter(col("ncnrm") > 0 && !isnan(col("ncnrm")))
      centroids = centroids.join(means, Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("ncvec"), col("cvec")).as("cvec"),
          coalesce(col("ncnrm"), col("cnrm")).as("cnrm"))
        .localCheckpoint(true)
      assign = ivfAssignScored(c, centroids).localCheckpoint(true)
      objs += assign.agg(sum(col("csim"))).head().getDouble(0)
    }
    IvfRefined(
      IvfIndex(centroids, assign.select(col("id").as("nid"),
        col("vec").as("nvec"), col("nrm").as("nnrm"), col("cell"))),
      objs.result())
  }

  /** Append a new vector batch into a STORED index: broadcast-assign
    * each new vector to its nearest EXISTING centroid and emit rows
    * shaped exactly like [[IvfIndex.assignments]] — the caller unions
    * (or parquet-appends) them onto the stored relation and serves
    * queries from the merged index unchanged. Centroids do not move:
    * the incremental contract is assignment-only (re-training is a
    * separate offline [[ivfBuildRefined]] run), so per-batch cost is
    * one broadcast assign over the BATCH — independent of index size.
    * The x34 growing-corpus contract applied to embeddings.
    */
  def ivfAppend(centroids: DataFrame, batch: DataFrame,
                idCol: String, vecCol: String): DataFrame =
    ivfAssign(withNorm(batch, idCol, vecCol), centroids, take = 1)
      .select(col("id").as("nid"), col("vec").as("nvec"),
        col("nrm").as("nnrm"), col("cell"))

  def ivfSearch(index: IvfIndex, queries: DataFrame,
                idCol: String, vecCol: String, k: Int,
                nprobe: Int): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val probes = ivfAssign(withNorm(queries, idCol, vecCol),
        index.centroids, take = nprobe)
      .select(col("id").as("qid"), col("vec").as("qvec"),
        col("nrm").as("qnrm"), col("cell"))
    val scored = probes.join(index.assignments, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")), 6).as("sim"))
      .distinct() // a (q, n) pair probed via two cells scores once
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** ANN top-k via multi-table LSH: candidates are the union of
    * same-bucket collisions over `tables` independent hash tables
    * (OR-amplification — recall 1-(1-p^nbits)^tables per neighbor),
    * deduped, then scored exactly and ranked per query. `nbits` tunes
    * bucket granularity (candidates per table ~ N/2^nbits), `tables`
    * buys recall at linear candidate cost. Approximate — recall@k and
    * precision (scores ⊆ exact scores) are verified in the spec suite
    * and by the declared empty-set oracle gates.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int, nbits: Int,
              tables: Int = 1): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    GraftExtensions.register(queries.sparkSession)
    val q = withNorm(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val c = withNorm(corpus, idCol, vecCol)
      .select(col("id").as("nid"), col("vec").as("nvec"), col("nrm").as("nnrm"))
    // ONE dim probe + ONE sign collect serve both sides: the seeds are
    // identical by construction, so the per-input duplicates were two
    // wasted driver round-trips on the hot ANN path
    val signs = dimOf(c.select(col("nid").as("id"), col("nvec").as("vec")))
      .orElse(dimOf(q.select(col("qid").as("id"), col("qvec").as("vec"))))
      .map(dim => hyperplaneSigns(queries.sparkSession, dim, 0 until tables * nbits))
    val (qb, cb) = signs match {
      case Some(sg) => (
        bucketsFromSigns(queries.select(col(idCol).as("id"), col(vecCol).as("vec")),
            sg, nbits, tables)
          .select(col("id").as("qid"), col("table"), col("bucket")),
        bucketsFromSigns(corpus.select(col(idCol).as("id"), col(vecCol).as("vec")),
            sg, nbits, tables)
          .select(col("id").as("nid"), col("table"), col("bucket")))
      case None => (
        q.select(col("qid"), lit(0).as("table"), lit(0L).as("bucket")).limit(0),
        c.select(col("nid"), lit(0).as("table"), lit(0L).as("bucket")).limit(0))
    }
    val candidates = qb.join(cb, Seq("table", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .distinct() // a pair colliding in several tables is scored once
    val scored = candidates.join(q, "qid").join(c, "nid")
      .select(col("qid"), col("nid"),
        round(dot(col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }
}
