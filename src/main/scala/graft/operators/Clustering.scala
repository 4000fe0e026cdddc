package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.QueryDef

/** Dedup clustering [EXT, north star]: connected components over the LSH
  * candidate graph (q22) by iterative min-label propagation. This is the
  * end-game of every near-dup pipeline — pairs are not actionable until
  * they are transitive-closed into clusters and one representative per
  * cluster is kept.
  *
  * Scale notes: label propagation converges in O(diameter) rounds, and
  * near-dup components have tiny diameters (they are quasi-cliques from
  * shared LSH buckets), so the loop is short by construction; for
  * adversarial graph shapes the same loop body upgrades to alternating
  * large-star/small-star contraction (Kiveris et al., "Connected
  * Components in MapReduce"), which bounds rounds at O(log n). Each
  * iteration is one keyed shuffle; `localCheckpoint` truncates the plan
  * lineage so iteration N does not replan/re-execute iterations 0..N-1
  * (on a real cluster: `checkpoint` to reliable storage instead).
  */
object Clustering {

  /** Min-label fixpoint over an undirected edge set (u, v). Returns
    * (node, cluster_id = min node id reachable). Pure DataFrame loop —
    * the per-round driver scalar is the convergence check only, never
    * data.
    */
  private[operators] def connectedComponents(edgesIn: DataFrame, maxIter: Int = 25): DataFrame = {
    // bidirectional edges: propagation must flow both ways (union is
    // positional, so selecting (v, u) swaps the direction)
    val e = edgesIn.toDF("u", "v")
    val edges = e.union(e.select(col("v"), col("u"))).distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node adopts min(own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels, edges("v") === labels("node"))
        .groupBy(col("u").as("node2"))
        .agg(min("label").as("nlabel"))
      // pointer doubling: also adopt the label OF the current label, so
      // label information travels 2^iter hops, not iter hops — the loop
      // converges in O(log diameter) rounds even on chain-shaped
      // components (one-hop propagation needs O(diameter), which a
      // sparse random near-threshold graph can push past any fixed
      // iteration budget; quasi-clique near-dup components hid this)
      val parents = labels.select(col("node").as("pnode"), col("label").as("plabel"))
      val next = labels
        .join(viaNeighbors, labels("node") === viaNeighbors("node2"), "left")
        .join(parents, labels("label") === parents("pnode"), "left")
        .select(col("node"),
          least(col("label"),
            coalesce(col("nlabel"), col("label")),
            coalesce(col("plabel"), col("label"))).as("newlabel"),
          col("label"))
        .select(col("node"), col("newlabel").as("label"),
          (col("newlabel") < col("label")).as("changed"))
        .localCheckpoint(true)
      converged = next.filter(col("changed")).isEmpty
      labels = next.select("node", "label")
      iter += 1
    }
    // A non-converged exit would return plausible-but-wrong labels with
    // no signal (a chain of diameter > maxIter). Fail loudly instead —
    // the convergence scalar is already computed, so the guard is free.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations; " +
          "raise maxIter or switch to large-star/small-star contraction")
    labels.select(col("node"), col("label").as("cluster_id"))
  }

  // q56 — dedup clusters: transitive closure of the q22 LSH candidate
  // pairs, with cluster sizes. The DuckDB oracle computes the same
  // fixpoint declaratively via a recursive CTE (set-semantics UNION
  // terminates when no new (node, label) facts appear).
  val q56DedupClusters: QueryDef = QueryDef.sql(
    "q56_dedup_clusters",
    s"""WITH RECURSIVE ${Dedup.lshSigsSql},
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM sigs a JOIN sigs b
       |            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(node, label) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node),
       |labeled AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, c.cluster_size
       |FROM labeled l
       |JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM labeled GROUP BY 1) c
       |  USING (cluster_id)
       |ORDER BY l.doc_id""".stripMargin) { (s, d) =>
    val pairs = Dedup.lshSigs(s, d)
      .groupBy("band", "sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val edges = Dedup.bucketPairs(pairs, "ids", "doc_a", "doc_b").distinct()
    val labels = connectedComponents(edges)
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labels.select(col("node").as("doc_id"), col("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  // q91 — embedding-dedup keep-list (the "SemDeDup" shape): transitive-
  // close the RP-LSH near-dup pairs (q90) into clusters and keep exactly
  // one representative per cluster — min vec_id, so the choice is
  // deterministic and needs no extra pass. Vectors in no pair are their
  // own (kept) cluster. This is the operator a training pipeline
  // actually runs: q90 finds the edges, this emits the keep/drop
  // decision per vector.
  //
  // Scale shape: q90's bucketed pair generation + q56's label
  // propagation (O(diameter) keyed shuffles, lineage-truncated) + one
  // broadcast-size left join back to the vector ids. The oracle runs
  // the identical closure as a recursive CTE over the identical
  // md5-derived hyperplanes.
  val q91EmbeddingDedup: QueryDef = QueryDef.sql(
    "q91_embedding_dedup",
    s"""WITH RECURSIVE ${Similarity.rpPairsSqlCte},
       |sel AS (SELECT vec_a, vec_b FROM pairs WHERE sim_raw > 0.3),
       |edges AS (SELECT vec_a AS eu, vec_b AS ev FROM sel
       |          UNION SELECT vec_b, vec_a FROM sel),
       |reach(node, label) AS (
       |  SELECT eu, eu FROM edges
       |  UNION
       |  SELECT e.eu, r.label FROM edges e JOIN reach r ON e.ev = r.node),
       |labeled AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY 1)
       |SELECT emb.vec_id,
       |       COALESCE(l.cluster_id, emb.vec_id) AS cluster_id,
       |       (COALESCE(l.cluster_id, emb.vec_id) = emb.vec_id) AS keep
       |FROM (SELECT vec_id FROM embeddings) emb
       |LEFT JOIN labeled l ON l.node = emb.vec_id
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val sel = Similarity.rpPairs(s, d)
      .filter(col("sim_raw") > 0.3)
      .select(col("vec_a"), col("vec_b")).distinct()
    val labels = connectedComponents(sel)
    graft.engine.Tables.widen(graft.engine.Tables.embeddings(s, d))
      .select(col("vec_id"))
      .join(labels, col("vec_id") === col("node"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
      .withColumn("keep", col("cluster_id") === col("vec_id"))
      .orderBy("vec_id")
  }

  val all: Seq[QueryDef] = Seq(q56DedupClusters, q91EmbeddingDedup)
}
