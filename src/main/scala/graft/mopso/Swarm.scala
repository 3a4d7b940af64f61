package graft.mopso

import scala.util.Random

import graft.mopso.Config._

/** One candidate clustering: position/velocity/bestPosition are K×F,
  * fitness/bestFitness are [dev, conn], crowding is the shared mutable
  * 1-element array (see [[ArchiveEntry]]).
  */
final case class Particle(
    position: Array[Array[Double]],
    velocity: Array[Array[Double]],
    fitness: Array[Double],
    bestPosition: Array[Array[Double]],
    bestFitness: Array[Double],
    crowding: Array[Double])

/** Swarm dynamics M6-M8 (SURVEY §2.8): driver-side, seeded RNG threaded
  * through every stochastic step (the reference uses the global unseeded
  * Random — SURVEY §7.4.4; the formulas are identical, the seed is ours).
  */
object Swarm {

  /** M8 inertia weight. */
  def weight(schedule: WSchedule, iter: Int, iterMax: Int,
      wMax: Double, wMin: Double): Double = schedule match {
    // MOPSO_Single.scala:132
    case WDecrease => (wMax - wMin) * (iterMax - iter) / iterMax + wMin
    // Spark_MOPSO_Avg.scala:199 (integer iter scaled by 1/iter_max)
    case WIncreaseScaled => (wMax + iter * (wMax - wMin) * 1.0) / iterMax
  }

  /** M7 velocity/position update
    * (updateParticleSwarmVelocityAndPosition, Spark_MOPSO_Avg.scala:497-540;
    * updateParticle, MOPSO_Single.scala:417-449;
    * Spark_MOPSO_Particle.scala:559-591):
    * v' = w·v + c1·r1·(pbest−x) + c2·r2·(gbest−x); x' = x + v'.
    * Out-of-range v is RESAMPLED uniformly in [Vmin,Vmax] (not clipped) when
    * clampVelocity; out-of-bounds x resampled within the feature bounds when
    * clampPosition (Single only). `bounds(j) = (max, min)` — the reference's
    * getFeatureThreshold tuple order (Spark_MOPSO_Avg.scala:1239-1252).
    */
  def updateVelocityPosition(
      p: Particle,
      gbestPosition: Array[Array[Double]],
      bounds: Array[(Double, Double)],
      w: Double,
      cfg: MopsoConfig,
      rng: Random): Particle = {
    val k = p.position.length
    val f = if (k == 0) 0 else p.position(0).length
    val newPos = Array.ofDim[Double](k, f)
    val newVel = Array.ofDim[Double](k, f)
    var i = 0
    while (i < k) {
      var j = 0
      while (j < f) {
        var v = w * p.velocity(i)(j) +
          cfg.c1 * rng.nextDouble() * (p.bestPosition(i)(j) - p.position(i)(j)) +
          cfg.c2 * rng.nextDouble() * (gbestPosition(i)(j) - p.position(i)(j))
        if (cfg.clampVelocity && (v > cfg.vMax || v < cfg.vMin)) {
          v = rng.nextDouble() * (cfg.vMax - cfg.vMin) + cfg.vMin
        }
        newVel(i)(j) = v
        var x = p.position(i)(j) + v
        if (cfg.clampPosition && (x > bounds(j)._1 || x < bounds(j)._2)) {
          x = rng.nextDouble() * (bounds(j)._1 - bounds(j)._2) + bounds(j)._2
        }
        newPos(i)(j) = x
        j += 1
      }
      i += 1
    }
    p.copy(position = newPos, velocity = newVel)
  }

  /** M6 pbest update — two reference behaviors (SURVEY §2.8 M6):
    *
    *  - [[PbestInverted]] (Single/Particle, MOPSO_Single.scala:459-472):
    *    `isDominatedBy(new, best)` is TRUE when the OLD best dominates the
    *    new fitness — and that branch REPLACES pbest with the new solution
    *    (inverted vs its comment); otherwise replace with prob 0.5.
    *    NOTE the else-branch coin flip also runs when NEW dominates OLD.
    *  - [[PbestDiscard]] (Avg, Spark_MOPSO_Avg.scala:248-273): the same
    *    computation runs, `Random` is consumed, and the result is thrown
    *    away — the particle keeps its original pbest (:272).
    *
    * Returns the particle with fitness set and pbest per mode.
    */
  def pbestUpdate(
      p: Particle,
      newFitness: Array[Double],
      mode: PbestMode,
      rng: Random): Particle = {
    var bp = p.bestPosition
    var bf = p.bestFitness
    if (Archive.dominates(p.bestFitness, newFitness)) {
      // old best dominates new → reference REPLACES here (inversion)
      bp = p.position; bf = newFitness
    } else if (rng.nextDouble() < 0.5) {
      bp = p.position; bf = newFitness
    }
    mode match {
      case PbestInverted =>
        p.copy(fitness = newFitness, bestPosition = bp, bestFitness = bf)
      case PbestDiscard => // computed above for RNG parity, then discarded
        p.copy(fitness = newFitness)
    }
  }

  /** I4 random velocity init: U(Vmin, Vmax) per K×F entry
    * (Spark_MOPSO_Avg.scala:130).
    */
  def initVelocity(k: Int, f: Int, vMin: Double, vMax: Double,
      rng: Random): Array[Array[Double]] =
    Array.fill(k, f)(rng.nextDouble() * (vMax - vMin) + vMin)
}
