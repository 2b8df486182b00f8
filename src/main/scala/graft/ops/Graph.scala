package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-analysis operators over an edge list — the web-graph side of a
  * crawl corpus (reference analog: none; this is the beyond-reference
  * graph family next to [[Dedup.duplicateClusters]]' connected
  * components). PageRank is the canonical ITERATIVE Spark workload:
  * each iteration is one join (ranks × edges) + one aggregate on the
  * destination key, so an iteration's cost is an equi-join shuffle on
  * the edge's dst — the shape that scales to billions of edges.
  *
  * Lineage control: every [[ckptEvery]] rounds (and at the final
  * round) the working frame localCheckpoints (EAGER) and the previous
  * checkpoint unpersists — the measured [[Dedup.duplicateClusters]]
  * pattern (plan nesting there went 1.7 s → 25 s/round by iteration 5
  * without it). Loops at or under the cadence (the pinned 2–3
  * iteration audit runs) keep their single-plan shape and pay zero
  * checkpoint overhead; only longer runs persist the loop-invariant
  * frames (edges, node base, out-degrees), because with per-cadence
  * jobs the reuse is genuinely cross-action (inside ONE plan a persist
  * would instead block ReusedExchange — measured 3× on q108).
  * Checkpointing changes no value: every per-edge contribution snaps
  * to fixed point pre-sum, so sums are order- and partitioning-free.
  *
  * Determinism: per-edge contributions snap to ×10⁹ fixed point BEFORE
  * the per-destination sum (order-free — the kmeans/cellMeans
  * convention), and the rank update arithmetic keeps one fixed
  * association, so ranks are bit-identical on any engine.
  */
object Graph {

  /** Checkpoint cadence for the iterative loops (see object scaladoc). */
  private val ckptEvery = 3

  /** Round-boundary lineage truncation: eager localCheckpoint of the
    * working frame, releasing the previous round's blocks. Returns the
    * checkpointed frame and the new "owned" handle.
    */
  private def truncate(df: DataFrame,
                       owned: Option[DataFrame]): (DataFrame, Option[DataFrame]) = {
    val c = df.localCheckpoint(true)
    owned.foreach(_.unpersist())
    (c, Some(c))
  }

  /** `iters` PageRank iterations over `edges` (src, dst) with damping
    * `d`: pr⁰ = 1/N; prⁱ⁺¹(v) = (1−d)/N + d·Σ_{(u,v)∈E} prⁱ(u)/out(u),
    * the per-edge term snapped to ×1e9 fixed point pre-sum. Nodes are
    * the union of both endpoint sets; sink nodes (no out-edges)
    * contribute nothing (their mass leaks — the plain formulation);
    * nodes with no in-edges hold the (1−d)/N base. Output: (id, pr).
    */
  def pageRank(edges: DataFrame, iters: Int, d: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val big = iters > ckptEvery
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (big) e0.persist() else e0
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    // N rides a one-row broadcast into every rank expression
    val nc = nodes.agg(count(lit(1)).as("n"))
    val outdeg0 = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val outdeg = if (big) outdeg0.persist() else outdeg0
    val base0 = nodes.crossJoin(broadcast(nc))
    val base = if (big) base0.persist() else base0
    var pr = base
      .select(col("id"), (lit(1.0) / col("n").cast("double")).as("pr"))
    var owned: Option[DataFrame] = None
    for (r <- 1 to iters) {
      val contrib = e.join(pr, col("src") === col("id"))
        .join(broadcast(outdeg), Seq("src"))
        .select(col("dst"),
          round(col("pr") / col("outdeg").cast("double") * lit(1e9))
            .cast("long").as("cfp"))
        .groupBy(col("dst")).agg(sum(col("cfp")).as("s"))
      pr = base
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(1.0 - d) / col("n").cast("double") +
            lit(d) * (coalesce(col("s"), lit(0L)).cast("double") / lit(1e9)))
            .as("pr"))
      if (big && (r % ckptEvery == 0 || r == iters)) {
        val (c, o) = truncate(pr, owned); pr = c; owned = o
      }
    }
    if (big) { e.unpersist(); outdeg.unpersist(); base.unpersist(): Unit }
    pr
  }

  /** `iters` HITS iterations over `edges` (src, dst): authority(v) =
    * Σ_{u→v} hub(u), hub(u) = Σ_{u→v} authority(v), each L1-normalized.
    * Contributions snap ×1e9 pre-sum, so every normalized score is a
    * ratio of two EXACT integers — bit-identical on any engine without
    * ever normalizing through a float total. The normalizer is a
    * one-row aggregate riding a broadcast (the same shape as
    * [[pageRank]]'s N); per-iteration cost is two equi-join shuffles
    * (auth on dst, hub on src). Output: (id, hub, auth).
    */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val big = iters > ckptEvery
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (big) e0.persist() else e0
    val nodes0 = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val nodes = if (big) nodes0.persist() else nodes0
    var hub = nodes.select(col("id"), lit(1.0).as("hub"))
    var auth = nodes.select(col("id"), lit(1.0).as("auth"))
    var ownedH: Option[DataFrame] = None
    var ownedA: Option[DataFrame] = None
    for (r <- 1 to iters) {
      val as = e.join(hub, col("src") === col("id"))
        .select(col("dst"),
          round(col("hub") * lit(1e9)).cast("long").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val at = as.agg(sum(col("s")).as("t"))
      auth = nodes.crossJoin(broadcast(at))
        .join(as, col("id") === col("dst"), "left")
        .select(col("id"),
          (coalesce(col("s"), lit(0L)).cast("double") /
            col("t").cast("double")).as("auth"))
      // auth truncates BEFORE hub is built from it: hub's checkpoint
      // job then reads auth's cached blocks instead of re-deriving the
      // whole auth subtree a second time
      if (big && (r % ckptEvery == 0 || r == iters)) {
        val (ca, oa) = truncate(auth, ownedA); auth = ca; ownedA = oa
      }
      val hs = e.join(auth, col("dst") === col("id"))
        .select(col("src"),
          round(col("auth") * lit(1e9)).cast("long").as("c"))
        .groupBy(col("src")).agg(sum(col("c")).as("s"))
      val ht = hs.agg(sum(col("s")).as("t"))
      hub = nodes.crossJoin(broadcast(ht))
        .join(hs, col("id") === col("src"), "left")
        .select(col("id"),
          (coalesce(col("s"), lit(0L)).cast("double") /
            col("t").cast("double")).as("hub"))
      if (big && (r % ckptEvery == 0 || r == iters)) {
        val (ch, oh) = truncate(hub, ownedH); hub = ch; ownedH = oh
      }
    }
    if (big) { e.unpersist(); nodes.unpersist(): Unit }
    hub.join(auth, Seq("id")).select(col("id"), col("hub"), col("auth"))
  }

  /** Personalized PageRank (TrustRank): the teleport distribution
    * concentrates on `seeds` instead of all nodes — pr⁰(v) = 1/|S| on
    * seeds else 0; prⁱ⁺¹(v) = (1−d)·[v ∈ S]/|S| + d·Σ prⁱ(u)/out(u).
    * Ranks measure proximity to the trusted seed set — the
    * crawl-frontier prioritization / spam-demotion signal a web
    * pipeline runs beside plain PageRank.
    *
    * Same iteration shape and ×10⁹ pre-sum snap as [[pageRank]] (one
    * equi-join + one dst-key aggregate per round, bit-identical
    * cross-engine); the seed membership flag rides the node frame so
    * the base term never needs a per-iteration join.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
                           d: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val big = iters > ckptEvery
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (big) e0.persist() else e0
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val sd = seeds.select(col("id")).distinct()
    val sc = sd.agg(count(lit(1)).as("ns"))
    val outdeg0 = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val outdeg = if (big) outdeg0.persist() else outdeg0
    val tagged0 = nodes
      .join(broadcast(sd.withColumn("__s", lit(1))), Seq("id"), "left")
      .crossJoin(broadcast(sc))
      .select(col("id"), (coalesce(col("__s"), lit(0)) === 1).as("is_seed"),
        col("ns"))
    val tagged = if (big) tagged0.persist() else tagged0
    var pr = tagged.select(col("id"),
      when(col("is_seed"), lit(1.0) / col("ns").cast("double"))
        .otherwise(lit(0.0)).as("pr"))
    var owned: Option[DataFrame] = None
    for (r <- 1 to iters) {
      val contrib = e.join(pr, col("src") === col("id"))
        .join(broadcast(outdeg), Seq("src"))
        .select(col("dst"),
          round(col("pr") / col("outdeg").cast("double") * lit(1e9))
            .cast("long").as("cfp"))
        .groupBy(col("dst")).agg(sum(col("cfp")).as("s"))
      pr = tagged.join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (when(col("is_seed"), lit(1.0 - d) / col("ns").cast("double"))
            .otherwise(lit(0.0)) +
            lit(d) * (coalesce(col("s"), lit(0L)).cast("double") / lit(1e9)))
            .as("pr"))
      if (big && (r % ckptEvery == 0 || r == iters)) {
        val (c, o) = truncate(pr, owned); pr = c; owned = o
      }
    }
    if (big) { e.unpersist(); outdeg.unpersist(); tagged.unpersist(): Unit }
    pr
  }

  /** Per-node triangle counts over an UNDIRECTED reading of `edges`
    * (src, dst): self-loops dropped, direction and duplicates collapsed
    * to one (u < v) edge. Enumeration is degree-ordered: every edge is
    * oriented from its lower-(degree, id) endpoint, wedges enumerate
    * only from oriented out-neighborhoods, and the closing edge is the
    * equi-join back against the oriented edge set — each triangle
    * materializes exactly once, and per-wedge work is bounded by the
    * ORIENTED out-degree (O(√m) on any graph), not the raw degree. A
    * hub with a million followers contributes no wedges from the hub
    * side; the naive neighbor self-join would square it. Per-node
    * credit is an explode of each triangle's 3 corners + one hash
    * aggregate. Output: (id, n_triangles), nodes in ≥ 1 triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val ue = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = ue.select(col("u").as("id"))
      .unionByName(ue.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient each edge from the (deg, id)-smaller endpoint, carrying
    // the head's degree so wedge legs can sort by the SAME key
    val oe = ue
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("a"), col("v").as("b"), col("dv").as("db")))
          .otherwise(
            struct(col("v").as("a"), col("u").as("b"), col("du").as("db")))
          .as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"), col("e.db").as("db"))
    // wedges (a; b, c) from a's oriented out-neighbors, legs ordered by
    // the orientation key (deg, id) — so the closing b–c edge is
    // oriented b→c exactly, and the closure check is a pure equi-join
    val tri = oe.as("x").join(oe.as("y"),
        col("x.a") === col("y.a") &&
          struct(col("x.db"), col("x.b")) < struct(col("y.db"), col("y.b")))
      .select(col("x.a").as("ta"), col("x.b").as("tb"), col("y.b").as("tc"))
      .join(oe.as("z"),
        col("z.a") === col("tb") && col("z.b") === col("tc"), "left_semi")
    tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Minimal hop counts from a seed set via `maxHops` rounds of
    * frontier expansion (multi-source BFS): each round expands ONLY the
    * nodes first reached in the previous round (the frontier), so a
    * node's edges are walked once no matter how many rounds run —
    * the settled set never re-expands. Per round: one equi-join shuffle
    * (frontier × edges on src) + one min-aggregate on the reached key.
    * Output: (id, hops), nodes within `maxHops` of any seed.
    */
  def shortestHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val big = maxHops > ckptEvery
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (big) e0.persist() else e0
    var dist = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0).as("hops"))
    var owned: Option[DataFrame] = None
    for (h <- 1 to maxHops) {
      val next = dist.filter(col("hops") === h - 1)
        .join(e, col("id") === col("src"))
        .select(col("dst").as("id"), lit(h).as("hops"))
      dist = dist.unionByName(next)
        .groupBy(col("id")).agg(min(col("hops")).as("hops"))
      if (big && (h % ckptEvery == 0 || h == maxHops)) {
        val (c, o) = truncate(dist, owned); dist = c; owned = o
      }
    }
    if (big) e.unpersist(): Unit
    dist
  }

  /** TIME-RESPECTING earliest arrival (temporal BFS) — reachability
    * when every hop must depart no earlier than the previous hop
    * arrived (event-propagation / information-flow semantics; plain
    * BFS overcounts by using edges "backwards in time"). State per
    * node is its EARLIEST arrival — earlier dominates (any
    * continuation legal from a later arrival is legal from an earlier
    * one), so the merge is a min-aggregate, and only IMPROVED nodes
    * re-expand (the [[shortestHops]] frontier economics: an edge set
    * is re-walked only when its source's arrival improves). Expanding
    * settled nodes would add only dominated candidates, so
    * frontier-only ≡ full expansion round for round. Per round: one
    * equi-join shuffle + one min-aggregate. Seeds start at arrival 0.
    * Output: (id, arrival), nodes reachable within `rounds` hops.
    */
  def temporalEarliestArrival(edges: DataFrame, seeds: DataFrame,
                              rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val big = rounds > ckptEvery
    val e0 = edges.select(col("src"), col("dst"), col("ts"))
    val e = if (big) e0.persist() else e0
    var best = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("arrival"))
    var frontier = best
    var ownedB: Option[DataFrame] = None
    var ownedF: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val cand = frontier.join(e, col("id") === col("src"))
        .filter(col("ts") >= col("arrival"))
        .groupBy(col("dst")).agg(min(col("ts")).as("cand_arrival"))
      val joined = cand.join(best, cand("dst") === best("id"), "left")
      frontier = joined
        .filter(col("arrival").isNull ||
          col("cand_arrival") < col("arrival"))
        .select(col("dst").as("id"), col("cand_arrival").as("arrival"))
      // frontier truncates BEFORE best is built from it, so best's
      // checkpoint job reads the cached frontier instead of re-deriving
      // the expansion subtree; after the FINAL round the frontier is
      // dead, so its truncation there would be one wasted
      // materialization job — best's own checkpoint still bounds the
      // returned lineage
      if (big && (r % ckptEvery == 0 || r == rounds) && r < rounds) {
        val (cf, of) = truncate(frontier, ownedF); frontier = cf; ownedF = of
      }
      best = best.unionByName(frontier)
        .groupBy(col("id")).agg(min(col("arrival")).as("arrival"))
      if (big && (r % ckptEvery == 0 || r == rounds)) {
        val (cb, ob) = truncate(best, ownedB); best = cb; ownedB = ob
      }
    }
    if (big) e.unpersist(): Unit
    best
  }

  /** Degree ASSORTATIVITY — the Pearson correlation of endpoint
    * degrees over the (symmetrized) edge list: positive means hubs
    * link to hubs (social-graph shape), negative means hubs link to
    * leaves (web/star shape). Both orientations of every undirected
    * edge enter (the standard convention), and the correlation reuses
    * [[Profile.olsTrend]]'s exact DECIMAL moment algebra under a
    * constant group. Output: one row (n, slope, r) where n = 2·|E|.
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val ue = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = ue.select(col("u").as("id"))
      .unionByName(ue.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val sym = ue.unionByName(
      ue.select(col("v").as("u"), col("u").as("v")))
    val pairs = sym
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    Profile.olsTrend(pairs, lit(1), col("du"), col("dv"))
      .select(col("n"), col("slope"), col("r"))
  }

  /** Synchronous label-propagation community detection — `iters`
    * rounds of: every node adopts the label most frequent among its
    * (undirected) neighbors, ties to the SMALLEST label. The node set
    * is the endpoints of NON-self-loop edges — a node with no edges,
    * or only self-loops, has no neighbors to vote and is absent from
    * the output (left-join it back as its own singleton community if
    * the caller needs full coverage). Labels start as node ids, so the result is
    * deterministic on any engine (plain LPA's random update order is
    * replaced by the synchronous sweep + total-order tiebreak). Per
    * round: one equi-join shuffle (labels × edges on the source key) +
    * one count aggregate on (node, label) + one argmin — the same
    * per-iteration economics as [[pageRank]], scaling to billions of
    * edges. Output: (id, community).
    */
  /** K-CORE membership after `rounds` synchronous peels — the
    * degeneracy screen that separates a graph's connected backbone
    * from its fringe (spam/link-farm detection reads it next to
    * PageRank): each round computes every surviving node's degree in
    * the INDUCED surviving subgraph (distinct neighbors, self-loops
    * dropped, symmetrized) and drops nodes below `k`. The peel
    * sequence is monotone, so a fixed `rounds` unroll yields a
    * superset of the true k-core that EQUALS it once a round removes
    * nothing — callers pin `rounds` to their graph's peel depth
    * (GraphSpec pins convergence on chains), exactly the fixed-round
    * contract of the other iterative ops here. Per round one pair of
    * endpoint semi-joins + one degree aggregate; the symmetrized edge
    * list persists across rounds, lineage truncates on the
    * [[pageRank]] cadence. Output: surviving (id, deg) — deg is the
    * final round's qualifying induced degree.
    */
  def kCoreRounds(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    val big = rounds > ckptEvery
    val ue = edges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    // NOT persisted: every round's consumer lives in the ONE output
    // plan, where ReusedExchange dedups the identical distinct — a
    // persist here blocks that and pays the InMemoryRelation columnar
    // round-trip per round (the q108/q210 lesson; measured 4.4 → 1.8 s
    // at sf0.1 on q216). Long runs' lineage is bounded by truncate.
    val sym = ue.unionByName(
        ue.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var out = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k).select(col("src").as("id"), col("deg"))
    var owned: Option[DataFrame] = None
    for (r <- 2 to rounds) {
      val alive = out.select(col("id"))
      val e = sym
        .join(alive.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(alive.select(col("id").as("dst")), Seq("dst"), "left_semi")
      out = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("id"), col("deg"))
      if (big && (r % ckptEvery == 0 || r == rounds)) {
        val (c, o) = truncate(out, owned); out = c; owned = o
      }
    }
    out
  }

  /** Distinct TWO-HOP neighborhood size per node — the
    * friend-of-friend reach feature (graph-ML embeddings, influence
    * screens, crawl-frontier prioritization): n_1hop = distinct
    * neighbors, n_2hop = nodes exactly two hops away (distinct,
    * excluding self and every direct neighbor — the classic
    * \|N₂ \\ (N₁ ∪ {v})\| definition). One wedge equi-join on the
    * middle endpoint (work Σ deg² — the [[triangleCounts]] economics;
    * at hub-heavy degree distributions cap or sketch upstream), one
    * distinct on the (id, nb) pair stream, the direct-edge exclusion
    * as an anti-join on the same key shape. Output:
    * (id, n_1hop, n_2hop).
    */
  def twoHopNeighborhood(edges: DataFrame): DataFrame = {
    val ue = edges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    val sym = ue.unionByName(
        ue.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val oneHop = sym.groupBy(col("src")).agg(count(lit(1)).as("n_1hop"))
    val twoHop = sym.as("a").join(sym.as("b"),
        col("a.dst") === col("b.src") && col("b.dst") =!= col("a.src"))
      .select(col("a.src").as("id"), col("b.dst").as("nb"))
      .distinct()
      .join(sym.select(col("src").as("id"), col("dst").as("nb")),
        Seq("id", "nb"), "left_anti")
      .groupBy(col("id")).agg(count(lit(1)).as("n_2hop"))
    oneHop.select(col("src").as("id"), col("n_1hop"))
      .join(twoHop, Seq("id"), "left")
      .withColumn("n_2hop", coalesce(col("n_2hop"), lit(0L)))
  }

  /** LINK-PREDICTION scores over the non-adjacent 2-hop pairs — the
    * classic neighborhood family (Liben-Nowell & Kleinberg 2003):
    * common-neighbor count, Jaccard overlap of the neighborhoods,
    * and the resource-allocation index Σ_z 1/deg(z) (Zhou et al.
    * 2009 — Adamic-Adar's exactly-rational sibling: RA's 1/deg
    * needs no logarithm, so every score here is exact integer
    * arithmetic with one ×1e6 floor per term). Candidate pairs come
    * from the wedge join a–z–b (a < b) minus existing edges — the
    * triangle-counting Σdeg² economics, never all pairs; per-score
    * floors: jaccard = ⌊cn·1e6/(|Γa|+|Γb|−cn)⌋, ra = Σ⌊1e6/deg z⌋.
    * Output per candidate pair: (a, b, common, jaccard_micro,
    * ra_micro).
    */
  def linkPredictionScores(edges: DataFrame,
                           maxDegree: Long = 0L): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def fdiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val ue = edges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    val sym0 = ue.unionByName(
        ue.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = sym0.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    // q102/OPH density guard: a hub of degree h contributes h² wedges
    // through its middle — at population scale one celebrity node
    // makes the join quadratic IN ONE TASK. Capping the MIDDLE node's
    // degree (the left side's dst IS the wedge middle) drops almost
    // no signal — RA weights a hub's wedge 1/h anyway; 0 = unlimited.
    val sym =
      if (maxDegree <= 0) sym0
      else sym0.join(
        deg.filter(col("deg") <= maxDegree)
          .select(col("id").as("dst")), Seq("dst"), "left_semi")
    val wedges = sym.as("l").join(sym0.as("r"),
        col("l.dst") === col("r.src") && col("l.src") < col("r.dst"))
      .select(col("l.src").as("a"), col("r.dst").as("b"),
        col("l.dst").as("z"))
      .join(deg.select(col("id").as("z"), col("deg").as("dz")),
        Seq("z"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"),
        sum(fdiv(dec(lit(1000000L)), dec(col("dz")))).as("ra_micro"))
      .join(sym0.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_anti") // drop already-linked pairs
    wedges
      .join(deg.select(col("id").as("a"), col("deg").as("da")),
        Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")),
        Seq("b"))
      .select(col("a"), col("b"), col("common"),
        fdiv(dec(col("common")) * lit(1000000L),
          dec(col("da") + col("db") - col("common")))
          .as("jaccard_micro"),
        col("ra_micro"))
  }

  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val big = iters > ckptEvery
    val ue = edges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    val e0 = ue.unionByName(
      ue.select(col("dst").as("src"), col("src").as("dst")))
    val e = if (big) e0.persist() else e0
    val nodes = e.select(col("src").as("id")).distinct()
    var lab = nodes.select(col("id"), col("id").as("lbl"))
    var owned: Option[DataFrame] = None
    for (r <- 1 to iters) {
      val votes = e.join(lab, col("src") === col("id"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      val win = votes.groupBy(col("dst"))
        .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl")))
          .as("new_lbl"))
      lab = lab.join(win, col("id") === col("dst"), "left")
        .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
      if (big && (r % ckptEvery == 0 || r == iters)) {
        val (c, o) = truncate(lab, owned); lab = c; owned = o
      }
    }
    if (big) e.unpersist(): Unit
    lab.select(col("id"), col("lbl").as("community"))
  }

  /** Seed-KEYED [[shortestHops]]: per-(seed, node) hop distances, the
    * input to per-seed centralities ([[harmonicCentrality]]) where the
    * plain variant collapses to min-over-any-seed. Same frontier
    * economics, state ≤ |seeds|·|nodes| rows — bounded by choosing few
    * seeds, the landmark-centrality deployment shape.
    */
  def shortestHopsPerSeed(edges: DataFrame, seeds: DataFrame,
                          maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val big = maxHops > ckptEvery
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (big) e0.persist() else e0
    var dist = seeds.select(col("id")).distinct()
      .select(col("id").as("seed"), col("id"), lit(0).as("hops"))
    var owned: Option[DataFrame] = None
    for (h <- 1 to maxHops) {
      val next = dist.filter(col("hops") === h - 1)
        .join(e, col("id") === col("src"))
        .select(col("seed"), col("dst").as("id"), lit(h).as("hops"))
      dist = dist.unionByName(next)
        .groupBy(col("seed"), col("id")).agg(min(col("hops")).as("hops"))
      if (big && (h % ckptEvery == 0 || h == maxHops)) {
        val (c, o) = truncate(dist, owned); dist = c; owned = o
      }
    }
    if (big) e.unpersist(): Unit
    dist
  }

  /** HARMONIC CENTRALITY from landmark seeds, truncated at `maxHops`:
    * C_H(s) = Σ_{v≠s, d(s,v)≤maxHops} 1/d(s,v) — the
    * disconnected-graph-safe closeness (unreached nodes contribute 0,
    * no infinite distances to special-case). The reciprocal sum runs
    * in EXACT integers scaled by lcm(1..maxHops) — one double
    * division per seed at the end. Output: (seed, n_reached,
    * harmonic).
    */
  def harmonicCentrality(edges: DataFrame, seeds: DataFrame,
                         maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 12,
      s"maxHops out of [1,12]: $maxHops")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmAll = (1L to maxHops.toLong)
      .foldLeft(1L)((l, k) => l / gcd(l, k) * k)
    shortestHopsPerSeed(edges, seeds, maxHops)
      .filter(col("hops") >= 1)
      .groupBy(col("seed"))
      .agg(count(lit(1)).as("n_reached"),
        sum(lit(lcmAll) / col("hops")).cast("long").as("hs"))
      .select(col("seed"), col("n_reached"),
        round((col("hs").cast("double") / lit(lcmAll.toDouble))
          .cast("decimal(20,10)"), 4).cast("double").as("harmonic"))
  }

  /** RECIPROCITY of a directed graph — the share of directed edges
    * whose reverse also exists (follows-back rate, mutual-link share
    * of a crawl graph). Distinct edges, self-loops excluded; mutual
    * detection is ONE self-join on the swapped key. Output one row:
    * (n_edges, n_mutual_edges, reciprocity_micro).
    */
  def reciprocity(edges: DataFrame, src: Column,
                  dst: Column): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def fdiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val e = edges.select(src.as("u"), dst.as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val mutual = e.join(e.select(col("v").as("u"), col("u").as("v")),
      Seq("u", "v"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(mutual.agg(count(lit(1))
        .as("n_mutual_edges"))))
      .withColumn("reciprocity_micro",
        when(col("n_edges") === 0L, lit(0L))
          .otherwise(fdiv(dec(col("n_mutual_edges")) * lit(1000000L),
            dec(col("n_edges")))))
  }

  /** BIPARTITE PROJECTION with a degree cap — the co-engagement graph
    * (user×item interactions → item–item edges) that powers
    * related-items, topic affinity, and co-crawl analyses. Per
    * surviving user the item pairs project with weight
    * Σᵤ min(cnt_ua, cnt_ub) (shared engagement, not mere
    * co-presence). The cap is the SCALE CONTRACT: a hub user
    * contributes O(degree²) pairs, so users with more than
    * `maxDegree` distinct items are EXCLUDED and counted — at 100 TB
    * the cap bounds the self-join exactly like LSH banding bounds
    * candidate pairs; silent inclusion of one 1e6-degree user would
    * emit 5·10¹¹ pairs. Output one row per item pair (item_a,
    * item_b, n_users, weight) with the constant kept/dropped user
    * counts.
    */
  def bipartiteProject(edges: DataFrame, u: Column, v: Column,
                       maxDegree: Int): DataFrame = {
    require(maxDegree >= 2, "maxDegree must be >= 2")
    val cnt = edges.groupBy(u.as("u"), v.as("v"))
      .agg(count(lit(1)).as("w"))
    val deg = cnt.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val kept = cnt.join(deg.filter(col("deg") <= maxDegree)
      .select(col("u")), "u")
    val l = kept.select(col("u"), col("v").as("va"), col("w").as("wa"))
    val r = kept.select(col("u"), col("v").as("vb"), col("w").as("wb"))
    val pairs = l.join(r, "u").filter(col("va") < col("vb"))
      .groupBy(col("va").as("item_a"), col("vb").as("item_b"))
      .agg(count(lit(1)).as("n_users"),
        sum(least(col("wa"), col("wb"))).as("weight"))
    val stats = deg.agg(
      sum(when(col("deg") <= maxDegree, 1L).otherwise(0L))
        .as("n_users_kept"),
      sum(when(col("deg") > maxDegree, 1L).otherwise(0L))
        .as("n_users_dropped"))
    pairs.crossJoin(broadcast(stats))
  }
}
