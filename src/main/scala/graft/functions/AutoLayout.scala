package graft.functions

import graft.operators.Clustering

/** The engine's DATA-DERIVED index-layout rules in one documented surface
  * (VERDICT r10 §next-6). The pattern is shared: each layout knob is
  * computed from ONE cheap O(n) count, pins a fixture fixed point so the
  * operator's oracle family is byte-unchanged at verify scale, and ships
  * with a measured decade curve in a committed scale_*.json. A pipeline
  * author reads the table below instead of three scaladocs; the
  * implementations (and their specs/oracles) stay with their operator
  * families — these are delegations, spec-pinned identical
  * (AutoLayoutSpec).
  *
  * | rule | value | fixed point | measured |
  * |---|---|---|---|
  * | [[lshPlanes]] | LshPlanes + ⌈log₂(n/500)⌉ | 4 planes at n ≤ 500 (c21 oracle) | scale_connlsh.json x10/x100 (+x1000 counts): pinned 4-plane layout 22.0B candidate pairs at x100 vs 183M scaled, recall 0.92–1.00 |
  * | [[ivfCells]] | max(K, ⌊√(n/5)⌋) | nlist = K = 10 at n = 500 → s7 ≡ s3 row-for-row | scale_ivfauto.json x10/x100 (+x1000 nlist): √-scaled cells; the pinned K would probe 10% of the corpus per query at x100 |
  * | [[ivfProbes]] | recall-targeted (see its scaladoc) | nprobe = 1 at nlist = K | scale_ivfauto.json: easy AND hard (displaced out-of-corpus) query recall per decade across the nprobe grid |
  * | [[nearDupPlanes]]/[[nearDupPairCap]] | FIXED 8 planes + cap 64 | the one layout that cannot grow (the cos ≥ 0.3 threshold fixes bucket coarseness) | scale_ivfauto.json: uncapped candidate mass is the per-decade WATCH metric (223.0M at x100); the capped emission d7 rides is the measured mitigation |
  *
  * Why layouts must derive from the data: a layout pinned at fixture
  * size has a fixed bucket/cell-mass distribution, so its candidate (or
  * per-probe) mass is a fixed FRACTION of n² (or n) — quadratic (or
  * linear-per-query) at 100 TB no matter how good the fixture numbers
  * looked. Growing planes with log₂(n) / cells with √n holds per-bucket
  * occupancy / per-probe candidate mass at the measured knee. The one
  * deliberate exception is the near-dup bucketing, whose coarseness is
  * fixed by the SEMANTIC threshold — there the engine caps emission
  * instead of growing the layout, and records the uncapped mass as a
  * per-decade watch metric.
  */
object AutoLayout {

  /** Sign-LSH plane count for the Conn/neighbor candidate generator —
    * delegates to [[graft.operators.Clustering.lshPlanesFor]].
    */
  def lshPlanes(n: Long): Int = Clustering.lshPlanesFor(n)

  /** IVF coarse-cell count for the auto ANN index — delegates to
    * [[Similarity.ivfCellsFor]].
    */
  def ivfCells(n: Long): Int = Similarity.ivfCellsFor(n)

  /** Probe count for a target-recall ANN query against an [[ivfCells]]
    * index — delegates to [[Similarity.ivfProbesFor]].
    */
  def ivfProbes(nlist: Int): Int = Similarity.ivfProbesFor(nlist)

  /** The semantically-FIXED near-dup layout (s4/d7): plane count set by
    * the cosine threshold's recall needs, emission bounded by
    * [[nearDupPairCap]] instead of layout growth.
    */
  val nearDupPlanes: Int = Similarity.NearDupPlanes

  /** Per-bucket candidate cap shared by the d3 lexical and d7 semantic
    * dedup pipelines — [[Dedup.MaxBucket]].
    */
  val nearDupPairCap: Int = Dedup.MaxBucket
}
