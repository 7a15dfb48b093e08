package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over near-duplicate candidate pairs.
  *
  * Pair emitters (C2–C4) answer "which documents look alike"; a training
  * pipeline then needs "which documents form one duplicate CLUSTER, and
  * which single member do we keep". Transitivity does that grouping:
  * A~B and B~C put A,C in one cluster even when the sketch never paired
  * them directly. This is the step the reference's driver-loop design has
  * no room for and a 100 TB corpus cannot do per-pair.
  *
  * Algorithm: min-label propagation (hash-to-min). Every node starts as
  * its own label; each round a node adopts the min label among itself and
  * its neighbors; fixpoint = every component labeled by its min node id.
  *
  * Scale shape:
  *  - Rounds = component diameter. Near-dup clusters are dense blobs
  *    (diameter 2–4), not chains — the pathological long-path graph does
  *    not occur among sketch candidates.
  *  - Each round is ONE equi-join of the symmetric edge list against the
  *    current labels plus a partial-aggregating groupBy — all keyed on
  *    node id, no task ever sees more than one node's neighborhood.
  *  - Only nodes that APPEAR in a pair iterate. Singletons (the vast
  *    majority of a real corpus) join back in one final narrow pass.
  *  - Convergence detection is a monotone invariant, not a diff-join:
  *    labels only ever decrease, so an unchanged label SUM (exact, in
  *    unbounded decimal) proves the fixpoint. One cheap agg per round.
  */
object Cluster {

  /** Outcome of one CC run, for specs and the skew-evidence probes:
    * the label frame (over subgraph nodes only — callers join back),
    * whether the loop reached fixpoint, how many rounds it took, and
    * which method ran ("propagation", "star", or "propagation+star"). */
  private[graft] final case class CcRun(labels: DataFrame, converged: Boolean,
                                        rounds: Int, method: String)

  /** Per-node cluster assignment: (id, cluster_id) with cluster_id = the
    * min node id reachable through `edges`. `nodes` may contain ids never
    * mentioned in `edges`; they come back as their own cluster. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          idCol: String, maxIters: Int = 20): DataFrame = {
    val run = propagationRun(edges, maxIters)
    require(run.converged, s"connectedComponents did not converge in $maxIters rounds " +
      "— component diameter exceeds the bound; raise maxIters or use " +
      "connectedComponentsAuto (star fallback closes long chains in log rounds)")
    joinBack(nodes, idCol, run.labels)
  }

  /** The min-label propagation loop, rounds exposed. Stops at fixpoint or
    * the round budget — the caller decides whether a budget miss is fatal
    * ([[connectedComponents]]) or a fallback trigger
    * ([[connectedComponentsAuto]]). */
  private[graft] def propagationRun(edges: DataFrame, maxIters: Int): CcRun = {
    val ea = edges.columns(0); val eb = edges.columns(1)
    val sym = edges.select(col(ea).as("src"), col(eb).as("dst"))
      .union(edges.select(col(eb).as("src"), col(ea).as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Iterate only over the candidate subgraph. Each round ends in an
    // EAGER localCheckpoint: without it the loop's logical plan nests one
    // join deeper per round and Catalyst/codegen work grows until it
    // dominates (or exhausts) the driver — the classic iterative-DataFrame
    // trap. Checkpointing pins each round to its materialized blocks, so
    // round i+1 plans against a flat scan. (On a real cluster with
    // executor churn, set a checkpoint dir and swap in `checkpoint` —
    // same shape, fault-tolerant blocks.)
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var lastSum = labels.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    if (lastSum == null) { // empty edge set: no subgraph nodes, nothing to iterate
      sym.unpersist()
      return CcRun(labels, converged = true, rounds = 0, "propagation")
    }

    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr_label"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint(true)
      val nextSum = next.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
      labels = next
      converged = nextSum.compareTo(lastSum) == 0
      lastSum = nextSum
      i += 1
    }
    sym.unpersist()
    CcRun(labels, converged, i, "propagation")
  }

  private def joinBack(nodes: DataFrame, idCol: String, labels: DataFrame): DataFrame =
    nodes.select(col(idCol).as("id"))
      .join(labels.withColumnRenamed("label", "cluster_id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))

  /** Shape-adaptive connected components: min-label propagation for
    * `propagationBudget` rounds (one cheap keyed join per round — the
    * right cost on near-dup graphs, whose components are dense blobs of
    * diameter 2–4), then, ONLY if the budget misses fixpoint, contract
    * the graph by the partial labels and finish with the alternating-star
    * face (log-round convergence regardless of diameter).
    *
    * Why contraction composes: propagation labels only ever decrease
    * toward each component's min id, so the partial label of a node is
    * some node id inside its own component. Rewriting every edge
    * (a, b) → (label(a), label(b)) therefore merges nodes WITHIN
    * components only — the contracted graph has the same component
    * structure over fewer (super-)nodes, and after `propagationBudget`
    * rounds every node within distance `budget` of its component min has
    * already collapsed into it, so the contracted graph is the residual
    * long-chain skeleton — exactly the shape the star transforms close
    * exponentially. Final label = star label of the propagation label.
    *
    * This is the production default for pair graphs whose shape is not
    * known in advance (a 100 TB corpus with boilerplate chains — doc A
    * near-dups B near-dups C without A~C — can produce deep components
    * that a fixed propagation budget must not silently mislabel and a
    * corpus-scale diameter must not be allowed to pay per-round). */
  def connectedComponentsAuto(nodes: DataFrame, edges: DataFrame, idCol: String,
                              propagationBudget: Int = 8, maxIters: Int = 25): DataFrame = {
    val run = propagationRun(edges, propagationBudget)
    if (run.converged) return joinBack(nodes, idCol, run.labels)

    val ea = edges.columns(0); val eb = edges.columns(1)
    val lbl = run.labels.localCheckpoint(true)
    val contracted = edges
      .join(lbl.withColumnRenamed("id", ea).withColumnRenamed("label", "ca"), ea)
      .join(lbl.withColumnRenamed("id", eb).withColumnRenamed("label", "cb"), eb)
      .select(col("ca").as("src"), col("cb").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    // star labels over SUPER-nodes; a super-node absent from the
    // contracted edge set (its component fully collapsed in phase 1)
    // keeps its own id as the final label
    val starRun = starRun0(contracted, maxIters)
    require(starRun.converged,
      s"connectedComponentsAuto star phase did not converge in $maxIters rounds")
    val composed = lbl
      .join(starRun.labels.withColumnRenamed("label", "final")
          .withColumnRenamed("id", "label"),
        Seq("label"), "left")
      .select(col("id"), coalesce(col("final"), col("label")).as("label"))
    joinBack(nodes, idCol, composed)
  }

  /** Alternating large-star / small-star connected components (the
    * MapReduce CC algorithm family of Kiveris et al.) — same output
    * contract as [[connectedComponents]], different convergence law:
    * rounds grow with LOG of the component size, not its diameter.
    *
    * Min-label propagation is the right face for near-dup graphs
    * (dense blobs, diameter 2–4). On chain-shaped graphs — temporal
    * event chains, citation paths, any component whose diameter grows
    * with its size — propagation needs diameter rounds while the star
    * transforms flatten the component exponentially: large-star hangs
    * every node above its neighborhood minimum, small-star re-hangs the
    * small side. ClusterSpec shows a 64-node path closing in a handful
    * of star rounds where propagation's bound trips at the same budget.
    *
    * Each round is two keyed aggregate+join passes over the edge list
    * (strictly more work per round than propagation's one) — choose by
    * graph shape. Same iterative-DataFrame discipline: every round ends
    * in an eager localCheckpoint; convergence is exact edge-set
    * stability. */
  def connectedComponentsStar(nodes: DataFrame, edges: DataFrame,
                              idCol: String, maxIters: Int = 25): DataFrame = {
    val ea = edges.columns(0); val eb = edges.columns(1)
    val run = starRun0(
      edges.select(col(ea).as("src"), col(eb).as("dst")), maxIters)
    require(run.converged,
      s"connectedComponentsStar did not converge in $maxIters rounds")
    nodes.select(col(idCol).as("id"))
      .join(run.labels.withColumnRenamed("label", "cluster_id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** The alternating-star loop over a (src, dst) edge frame, rounds
    * exposed. Returns labels over the subgraph's nodes. */
  private[graft] def starRun0(edges0: DataFrame, maxIters: Int): CcRun = {

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      // m = min over the closed neighborhood (self included)
      val m = sym.union(sym.select(col("src"), col("src").as("dst")).distinct())
        .groupBy(col("src")).agg(min(col("dst")).as("m"))
      sym.join(m, "src").where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst")).distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // orient each edge big -> small; u's neighbors here are all < u
      val o = e.select(greatest(col("src"), col("dst")).as("u"),
          least(col("src"), col("dst")).as("v"))
        .where(col("u") =!= col("v"))
      val m = o.groupBy(col("u")).agg(min(col("v")).as("m"))
      o.join(m, "u").where(col("v") =!= col("m"))
        .select(col("v").as("src"), col("m").as("dst"))
        .union(m.select(col("u").as("src"), col("m").as("dst")))
        .distinct()
    }

    def labelsOf(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      sym.union(sym.select(col("src"), col("src").as("dst")).distinct())
        .groupBy(col("src")).agg(min(col("dst")).as("label"))
        .withColumnRenamed("src", "id")
    }

    var e = edges0
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    // termination = the EDGE SET is stable (the state here is the edge
    // list, not a label column, so a label-sum invariant would not be
    // sound): equal counts + an empty anti-join proves set equality
    var cnt = e.count()
    var converged = cnt == 0
    var i = 0
    while (!converged && i < maxIters) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextCnt = next.count()
      converged = nextCnt == cnt &&
        next.join(e, Seq("src", "dst"), "left_anti").isEmpty
      e = next; cnt = nextCnt
      i += 1
    }
    CcRun(labelsOf(e), converged, i, "star")
  }
}
