package graft.ops

/** G18 — operational sample-size calculators (func_aux/func_test.py:582-647).
  * Pure scalar functions (no data): they size validation sets for FPR /
  * false-positives-per-hour targets, so they run on the driver by design.
  */
object Calculators {

  /** Minimum n with zero observed FP such that the one-sided exact
    * (rule-of-three-style) bound excludes fprMax at confidence 1−alpha:
    * exact form n ≥ log(alpha) / log(1 − fprMax). */
  def minSamplesZeroFpExact(fprMax: Double, alpha: Double = 0.05): Long = {
    require(fprMax > 0 && fprMax < 1 && alpha > 0 && alpha < 1)
    math.ceil(math.log(alpha) / math.log1p(-fprMax)).toLong
  }

  /** The common approximation n ≥ ln(1/alpha) / fprMax. */
  def minSamplesZeroFpApprox(fprMax: Double, alpha: Double = 0.05): Long = {
    require(fprMax > 0 && alpha > 0 && alpha < 1)
    math.ceil(math.log(1.0 / alpha) / fprMax).toLong
  }

  /** σ-level → two-sided alpha via the error function:
    * alpha = 1 − erf(σ/√2). */
  def sigmaToAlpha(sigma: Double): Double =
    1.0 - org.apache.commons.math3.special.Erf.erf(sigma / math.sqrt(2.0))

  /** Benign-hours needed to bound false-positives-per-hour at target with
    * zero observed FP: hours ≥ minSamples(fphTarget·hopHours) in events →
    * expressed directly in hours: log(alpha)/log(1−p) with p the per-event
    * rate fphTarget·hopSeconds/3600. */
  def minBenignHoursZeroFp(fphTarget: Double, hopSeconds: Double,
      alpha: Double = 0.05): Double = {
    val perEvent = fphTarget * hopSeconds / 3600.0
    require(perEvent > 0 && perEvent < 1)
    val n = math.log(alpha) / math.log1p(-perEvent)
    n * hopSeconds / 3600.0
  }

  /** Benign WINDOW count for the FPH bound — the reference's
    * `required_negatives_for_sigma_fph` (func_test.py:628-647): the
    * hours requirement converted at one window per `hopSeconds`. */
  def minBenignWindowsZeroFp(fphTarget: Double, hopSeconds: Double,
      alpha: Double = 0.05): Double = {
    require(hopSeconds > 0)
    // hours form uses the approx ln(1/alpha)/fph (the reference returns the
    // approx in both branches of required_hours_for_sigma_fph)
    val hours = math.log(1.0 / alpha) / fphTarget
    hours * 3600.0 / hopSeconds
  }
}
