package graft.mopso

import graft.core.Linalg

/** Immutable per-partition evaluation state: the partition's points plus
  * each point's L nearest neighbors WITHIN the partition.
  *
  * The reference recomputes the full O(n²) all-pairs distance matrix inside
  * `Conn` for EVERY particle in EVERY iteration
  * (Spark_MOPSO_Avg.scala:1036-1063 called from :843-865) — but the
  * neighbor ranking depends only on the points, never on the particle. So
  * the engine computes neighbor lists ONCE per partition and reuses them
  * across all 50 particles × all iterations: O(n²F) once instead of
  * O(n²F · particles · iters). Purely physical — the ranking (including the
  * reference's stable-sort tie order: ascending scan index for equal
  * distances, Spark_MOPSO_Avg.scala:1048-1050) is identical.
  */
final case class PartData(
    points: Array[Array[Double]],
    neighbors: Array[Array[Int]]) extends Serializable

object FitnessKernel {

  /** Top-L neighbor indices per point via bounded insertion (O(n·L) state
    * per point instead of a full sort). Stability contract: for equal
    * distances the LOWER scan index ranks first — exactly what the
    * reference's stable `sortBy(_._2)` over an ascending-j buffer yields.
    */
  def buildNeighbors(points: Array[Array[Double]], l: Int): Array[Array[Int]] = {
    val n = points.length
    val out = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val cap = math.min(l, math.max(n - 1, 0))
      val bestDist = new Array[Double](cap)
      val bestIdx = new Array[Int](cap)
      var count = 0
      var j = 0
      while (j < n) {
        if (j != i) {
          val d = Linalg.euclid(points(i), points(j))
          // grow while under capacity; once full, only a STRICTLY smaller
          // distance evicts the worst (ties keep the earlier j — matching
          // the reference's stable sortBy + take(L))
          if (count < cap || (cap > 0 && d < bestDist(cap - 1))) {
            var pos = math.min(count, cap - 1)
            while (pos > 0 && bestDist(pos - 1) > d) pos -= 1
            var m = math.min(count, cap - 1)
            while (m > pos) {
              bestDist(m) = bestDist(m - 1); bestIdx(m) = bestIdx(m - 1)
              m -= 1
            }
            bestDist(pos) = d
            bestIdx(pos) = j
            if (count < cap) count += 1
          }
        }
        j += 1
      }
      out(i) = bestIdx.take(count)
      i += 1
    }
    out
  }

  /** Nearest-centroid assignment (calKmeans / calPartitionKmeans,
    * Spark_MOPSO_Avg.scala:660-675): 1-based cluster ids, ties toward the
    * lower id (first strict minimum). Returns (cluster per point, Dev sum).
    */
  def assign(points: Array[Array[Double]],
      centers: Array[Array[Double]]): (Array[Int], Double) = {
    val n = points.length
    val clusters = new Array[Int](n)
    var dev = 0.0
    var i = 0
    while (i < n) {
      val (bestK, bestD) = assignOne(points(i), centers)
      clusters(i) = bestK
      dev += bestD
      i += 1
    }
    (clusters, dev)
  }

  /** Nearest centroid of ONE point: (1-based cluster id, distance) —
    * the single-point face of [[assign]] (same strict-minimum tie rule),
    * shared by the no-collect global path ([[GlobalNeighbors]]).
    */
  def assignOne(pt: Array[Double],
      centers: Array[Array[Double]]): (Int, Double) = {
    var bestK = 1
    var bestD = Double.MaxValue
    var k = 0
    while (k < centers.length) {
      val d = Linalg.euclid(pt, centers(k))
      if (d < bestD) { bestD = d; bestK = k + 1 }
      k += 1
    }
    (bestK, bestD)
  }

  /** One row's (dev, conn) terms from its own features plus its neighbor
    * FEATURES in ascending rank order — per-row bit-identical to the
    * terms [[devConn]] accumulates, enabling a fully distributed exact
    * global evaluation with no driver collect (the neighbor's cluster is
    * recomputed from its features instead of looked up in a shared
    * clusters array: redundant compute, zero shuffle).
    */
  def rowPartial(feat: Array[Double], nbrs: Array[Array[Double]],
      centers: Array[Array[Double]], l: Int): (Double, Double) = {
    val (own, dev) = assignOne(feat, centers)
    var conn = 0.0
    val lim = math.min(l, nbrs.length)
    var idx = 0
    while (idx < lim) {
      if (assignOne(nbrs(idx), centers)._1 == own) conn += 1.0 / (idx + 1)
      idx += 1
    }
    (dev, conn)
  }

  /** (Dev, Conn) of one particle over one scope (partition or whole data).
    *
    * Conn (Spark_MOPSO_Avg.scala:1036-1063): for each point, walk its L
    * nearest neighbors; when the neighbor shares the point's cluster add
    * 1/(rank+1) — the reference REWARDS same-cluster neighbors while both
    * objectives are minimized (SURVEY §7.4.2); replicated as written.
    * Reference indexes nn(0..L-1) unguarded and would throw on partitions
    * with ≤ L points; the engine caps at the available neighbor count
    * (documented divergence — only reachable where the reference crashes).
    */
  def devConn(pd: PartData, centers: Array[Array[Double]], l: Int): (Double, Double) = {
    val (clusters, dev) = assign(pd.points, centers)
    var conn = 0.0
    var i = 0
    while (i < pd.points.length) {
      val nbr = pd.neighbors(i)
      val lim = math.min(l, nbr.length)
      var idx = 0
      while (idx < lim) {
        if (clusters(i) == clusters(nbr(idx))) conn += 1.0 / (idx + 1)
        idx += 1
      }
      i += 1
    }
    (dev, conn)
  }

  /** A8 partition partial (calFitnessNew, Spark_MOPSO_Avg.scala:843-865):
    * (Dev·rate, Conn·rate) with rate = n_partition / n_total.
    */
  def partitionPartial(pd: PartData, centers: Array[Array[Double]], l: Int,
      total: Long): (Double, Double) = {
    val (dev, conn) = devConn(pd, centers, l)
    val rate = pd.points.length.toDouble / total
    (dev * rate, conn * rate)
  }
}
