package graft.functions

/** Shared numeric helpers for driver-side parameter-server state. */
object Num {
  /** Round to 12 significant digits — the engine-wide determinism
    * convention for driver-held floats that steer an iterative
    * trajectory (k-means++ ψ, EM likelihoods, covariance entries):
    * partition-order float jitter lives beyond digit ~15, so rounding
    * at 12 makes the value independent of reduction order while losing
    * no decision-relevant precision. One definition so a tolerance
    * change cannot silently diverge the operators' reproducibility
    * contracts.
    */
  def roundSig(x: Double): Double =
    if (x == 0.0 || !java.lang.Double.isFinite(x)) x
    else BigDecimal(x).round(new java.math.MathContext(12)).toDouble

  /** Driver-side dot product (left-to-right accumulation — the same
    * order VecDot uses, so driver re-derivations of codegen'd scores
    * are bit-identical). One definition for every operator that does
    * driver geometry over bounded pools (k-means‖ recluster, k-center
    * certificates, MMR redundancy).
    */
  def dot(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
