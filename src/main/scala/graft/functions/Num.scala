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
}
