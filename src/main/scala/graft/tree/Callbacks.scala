package graft.tree

/** Per-iteration training callback (the reference's `TrainingCallback`,
  * `python-package/xgboost/callback.py:51-120`): driver-side hooks around
  * each boosting round. `afterIteration` returning true stops training
  * (the protocol `EarlyStopping`/`EvaluationMonitor` use, `callback.py:311,
  * 511`). `evalLog` carries the watch metric of this round when one is
  * being evaluated. */
trait TrainingCallback {
  def beforeIteration(iter: Int): Unit = {}
  def afterIteration(iter: Int, evalLog: Map[String, Double]): Boolean = false
  def afterTraining(bestIteration: Int): Unit = {}
}

/** Distributed custom eval metric (the reference's `custom_metric`,
  * `python-package/xgboost/training.py:53`, JVM `runtimeParams.eval`):
  * per-row (numerator, denominator) contributions are summed across the
  * cluster — the partial+final shape every built-in metric uses — and
  * `finish` turns the two sums into the metric value. */
trait CustomEvalMetric extends Serializable {
  def name: String
  /** (num, den) contribution of one row at the current raw margin. */
  def contribution(margin: Double, label: Double, weight: Double): (Double, Double)
  def finish(num: Double, den: Double): Double = num / den
  /** true ⇒ larger is better (early stopping direction). */
  def maximize: Boolean = false
}
