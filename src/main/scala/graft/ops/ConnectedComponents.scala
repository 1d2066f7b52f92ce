package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair set — the cluster-exact
  * canonicalization for near-duplicate graphs (the alternative to
  * [[Curate.curateWithNearDup]]'s single-pass smaller-id-wins policy, whose
  * drop set is pairwise-local and can differ from one-survivor-per-cluster
  * on transitive chains).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the standard
  * O(log²  n)-round, shuffle-bounded CC for data-parallel engines:
  *
  *  - large-star: every node u connects its STRICTLY LARGER neighbors to
  *    m(u) = min(Γ(u) ∪ {u})
  *  - small-star: on min-oriented edges (u > v), every node connects its
  *    smaller neighbors AND itself to min(Γ⁻(u) ∪ {u})
  *
  * Both rounds are plain groupBy + join over the edge set (shuffle keyed by
  * node id, map-side-combinable min aggregates); no step ever materializes
  * a neighborhood list, so a hub node of any degree streams through the
  * min-aggregate. Lineage is truncated per round with localCheckpoint
  * (an iterative loop otherwise compounds the plan). Convergence is
  * detected by an order-free (count, xxhash-sum) checksum of the edge set.
  *
  * At 100 TB grain the input here is the VERIFIED near-dup pair set —
  * orders of magnitude smaller than the corpus (pairs only exist where
  * candidate buckets collided and exact verification passed), so the loop's
  * shuffles are on the small frame; the corpus itself is touched only by
  * the one join that applies the survivor set.
  */
object ConnectedComponents {

  /** Component assignment for every node appearing in `pairs`: returns
    * (id, component) where component = the MINIMUM id in the node's
    * connected component (the component root is its own component). Works
    * for any orderable id type (numeric, string). */
  def components(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                 maxIterations: Int = 30): DataFrame = {
    val nodes = pairs.select(col(idA).as("id"))
      .union(pairs.select(col(idB).as("id")))
      .filter(col("id").isNotNull).distinct()

    // min-oriented canonical edges (u > v)
    var edges = pairs
      .filter(col(idA).isNotNull && col(idB).isNotNull)
      .select(greatest(col(idA), col(idB)).as("u"), least(col(idA), col(idB)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    def checksum(e: DataFrame): (Long, Long) = {
      // order-free set fingerprint: count + XOR of pair hashes (XOR instead
      // of sum — ANSI mode makes a long-sum overflow fatal)
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var prev = checksum(edges)
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIterations) {
      // LARGE-STAR: both directions, m(u) = min(Γ(u) ∪ {u}); emit (v, m(u))
      // for strictly larger neighbors v — output stays min-oriented
      val nbr = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val m = nbr.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = nbr.join(m, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // SMALL-STAR: per u over its smaller neighbors Γ⁻(u), connect every
      // member of Γ⁻(u) ∪ {u} to the minimum
      val mS = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = large.join(mS, Seq("u"))
        .select(explode(array(
          struct(col("u").as("a"), col("m").as("b")),
          struct(col("v").as("a"), col("m").as("b")))).as("p"))
        .select(col("p.a").as("u"), col("p.b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      val cur = checksum(small)
      // checksum() materialized small's checkpoint, so the SUPERSEDED
      // round's blocks can be freed now — otherwise every round's
      // localCheckpoint stays persisted until GC (up to maxIterations
      // retained edge-set copies in executor storage). The FINAL round's
      // checkpoint must stay: localCheckpoint truncates lineage, its blocks
      // ARE the data behind the returned plan.
      edges.unpersist(blocking = false)
      converged = cur == prev
      prev = cur
      edges = small
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIterations " +
      "large/small-star rounds — component diameter beyond the doubling bound " +
      "(raise maxIterations)")
    // converged edge set is a star forest: one (node, root) row per non-root
    nodes.join(edges, nodes("id") === edges("u"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("component"))
  }

  /** Survivor set under cluster-exact canonicalization: the component ROOT
    * (minimum id) survives; every other member is dropped. Returns the
    * dropped ids (one column named `idOut`). */
  def droppedByComponent(pairs: DataFrame, idA: String = "id_a",
                         idB: String = "id_b", idOut: String = "doc_id"): DataFrame =
    components(pairs, idA, idB)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idOut))

  /** Survivor set under a SCORE policy: within each component the member
    * with the highest score survives (tie → minimum id); every other
    * member drops. Where [[droppedByComponent]]'s min-id root is an
    * arbitrary-but-deterministic pick, a training corpus usually wants to
    * keep the BEST copy of a near-dup cluster (highest quality score), not
    * the earliest-crawled one.
    *
    * `scored` provides one (idCol, scoreCol) row per node — it must cover
    * every node in `pairs` (an unscored node fails LOUD at execution via
    * `raise_error`: silently dropping it or keeping it unconditionally
    * would both corrupt the policy) and must be id-unique (duplicate score
    * rows double-count a node; the output set stays correct only because
    * the survivor pick is per-component deterministic, so the contract is
    * documented rather than re-aggregated here — callers pass dedup
    * output). Scale shape: every row past [[components]] is a slim (id,
    * component, score) triple — one id-keyed join, one component-grain
    * min-struct agg (map-side combined), one component-keyed join back;
    * works for any orderable id type. Returns dropped ids (one column,
    * `idOut`). */
  def droppedByPolicy(pairs: DataFrame, scored: DataFrame, idCol: String,
                      scoreCol: String, idA: String = "id_a",
                      idB: String = "id_b", idOut: String = "doc_id",
                      maxIterations: Int = 30): DataFrame = {
    val comps = components(pairs, idA, idB, maxIterations)
    val s = scored.select(col(idCol).as("id"),
      col(scoreCol).cast("double").as("__score"))
    val withScore = comps.join(s, Seq("id"), "left").select(col("id"),
      col("component"),
      coalesce(col("__score"), raise_error(concat(
        lit("droppedByPolicy: no score for node "), col("id").cast("string")))
        .cast("double")).as("__score"))
    // survivor = lexicographic min of (-score, id): max score, tie min id
    val surv = withScore.groupBy(col("component"))
      .agg(min(struct((-col("__score")).as("ns"), col("id").as("id"))).as("w"))
      .select(col("component"), col("w.id").as("__surv"))
    withScore.join(surv, Seq("component"))
      .filter(col("id") =!= col("__surv"))
      .select(col("id").as(idOut))
  }
}
