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
      val next = labels
        .join(viaNeighbors, labels("node") === viaNeighbors("node2"), "left")
        .select(col("node"), least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (col("nlabel") < col("label")).as("changed"))
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

  val all: Seq[QueryDef] = Seq(q56DedupClusters)
}
