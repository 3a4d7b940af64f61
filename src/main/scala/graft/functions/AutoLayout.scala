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
  * | [[pqRerank]] | max(50, ⌈n·np/(nlist·50)⌉) — shortlist as a fixed 1/50 of per-query ADC candidate mass | the 50 floor at n = 500 ⇒ s9's serving settings unchanged | scale_pq.json: rr50 vs auto vs 2·auto recall per decade — the pinned depth decays 0.903 → 0.578 (hard, x10 → x100) where the rule holds 0.975/1.000 (hard/easy at x100), and doubling it buys only +0.005 (the nprobe pruning ceiling) |
  * | [[nearDupPlanes]]/[[nearDupPairCap]] | FIXED 8 planes + cap 64 | the one layout that cannot grow (the cos ≥ 0.3 threshold fixes bucket coarseness) | scale_ivfauto.json: uncapped candidate mass is the per-decade WATCH metric (223.0M at x100); the capped emission d7 rides is the measured mitigation |
  * | [[minhashBands]] | argmin over b·r = N of \|(1/b)^(1/r) − t\| | (2, 4) at d3's implied target ⇒ d3/d6 oracles byte-unchanged | d10_lsh_auto replays the derived layout end-to-end in DuckDB; derived from the SEMANTIC threshold (which pairs collide), not corpus size |
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

  /** Table count calibrated at build time on THIS corpus's sampled
    * neighbor recall — the OR-amplification companion to [[lshPlanes]]
    * (planes hold candidate mass; tables buy recall back at linear
    * cost on corpora whose neighbors are genuinely spread — see the
    * round-13 indep-fixture findings). Delegates to
    * [[graft.operators.Clustering.lshTablesCalibrated]].
    */
  def lshTablesCalibrated(s: org.apache.spark.sql.SparkSession,
      dir: String,
      target: Double = Clustering.LshRecallTarget): Int =
    Clustering.lshTablesCalibrated(s, dir, target)

  /** IVF coarse-cell count for the auto ANN index — delegates to
    * [[Similarity.ivfCellsFor]].
    */
  def ivfCells(n: Long): Int = Similarity.ivfCellsFor(n)

  /** Probe count for a target-recall ANN query against an [[ivfCells]]
    * index — delegates to [[Similarity.ivfProbesFor]]. This is the
    * CLOSED-FORM default (√nlist), whose recall target is a property
    * of the corpus family it was measured on: the round-13 `indep`
    * fixture (copies displaced half an inter-point distance, not ε)
    * reads 0.80/0.82 easy/hard at the default where the ε decades
    * read ≥ 0.9. When the corpus's neighbor geometry is unknown,
    * calibrate instead of trusting the constant —
    * [[ivfProbesCalibrated]].
    */
  def ivfProbes(nlist: Int): Int = Similarity.ivfProbesFor(nlist)

  /** Probe count calibrated at index-build time on THIS corpus's
    * measured hard-query recall: doubling grid walk from the √nlist
    * floor, first setting meeting the target (default 0.9), one exact
    * denominator for the walk — delegates to
    * [[Similarity.ivfProbesCalibrated]]. O(sample·n) once per corpus
    * version, amortized over every query served.
    */
  def ivfProbesCalibrated(s: org.apache.spark.sql.SparkSession,
      dir: String,
      target: Double = Similarity.ProbeRecallTarget): Int =
    Similarity.ivfProbesCalibrated(s, dir, target)

  /** The semantically-FIXED near-dup layout (s4/d7): plane count set by
    * the cosine threshold's recall needs, emission bounded by
    * [[nearDupPairCap]] instead of layout growth.
    */
  val nearDupPlanes: Int = Similarity.NearDupPlanes

  /** Per-bucket candidate cap shared by the d3 lexical and d7 semantic
    * dedup pipelines — [[Dedup.MaxBucket]].
    */
  val nearDupPairCap: Int = Dedup.MaxBucket

  /** IVFADC exact-rerank shortlist depth for a corpus of `n` vectors
    * under an ([[ivfCells]], [[ivfProbes]]) layout — delegates to
    * [[Similarity.pqRerankFor]].
    */
  def pqRerank(n: Long, nlist: Int, nprobe: Int): Int =
    Similarity.pqRerankFor(n, nlist, nprobe)

  /** MinHash (bands, rowsPerBand) for a target Jaccard threshold —
    * delegates to [[Dedup.minhashBandsFor]]. Unlike the size-derived
    * rules above, this one derives from the SEMANTIC similarity target:
    * banding decides which similarity regime collides at all.
    */
  def minhashBands(numHashes: Int, targetJaccard: Double): (Int, Int) =
    Dedup.minhashBandsFor(numHashes, targetJaccard)
}
