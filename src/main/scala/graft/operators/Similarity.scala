package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.engine.{QueryDef, Tables}
import graft.functions.{GraftFunctions, VectorOps}

/** Embedding similarity search [EXT, north star]: brute-force cosine top-k
  * as the exact baseline and an IVF-style partition-pruned variant as the
  * scale path.
  *
  * 100 TB design: the query vector(s) are broadcast; the scan side streams
  * once computing the dot product inside codegen; top-k is per-partition
  * top-k + a k-sized driver merge (TakeOrderedAndProject), never a full
  * sort. The IVF variant adds a centroid-assignment column at write time
  * (or one linear pass), so a probe prunes to matching centroid partitions
  * — the classic inverted-file layout expressed as partition pruning.
  */
object Similarity {

  private def embDouble(s: SparkSession, d: String): DataFrame =
    Tables.widen(Tables.embeddings(s, d))
      .select(col("vec_id"), col("label"), VectorOps.toDouble(col("embedding")).as("e"))

  /** Codegen'd single-pass cosine (bit-identical to [[VectorOps.cosine]],
    * ~3-4× faster on the probe kernel).
    */
  private def cos(a: Column, b: Column): Column = GraftFunctions.cosine(a, b)

  // q18 — brute-force cosine top-10 for query vector vec_id = 0. Raw
  // (unrounded) similarity drives the ordering; the emitted value is
  // rounded to 4 dp so engine-level 1-ulp summation differences (Spark
  // folds sequentially; DuckDB's list_cosine_similarity may not) cannot
  // flip the compare.
  val q18Similarity: QueryDef = QueryDef.sql(
    "q18_similarity",
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id, round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 4) AS sim
      |FROM embeddings e, q
      |WHERE e.vec_id <> 0
      |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC, e.vec_id
      |LIMIT 10""".stripMargin) { (s, d) =>
    val emb = embDouble(s, d)
    val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), cos(col("e"), col("qe")).as("sim_raw"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("sim_raw"), 4).as("sim"))
  }

  // q25 — embedding-cosine near-dup pairs over a bounded id range (the
  // exact quadratic kernel; the LSH/IVF variants below are the scale path —
  // at 100 TB you never run the all-pairs form unbucketed).
  val q25EmbeddingNearDup: QueryDef = QueryDef.sql(
    "q25_embedding_neardup",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 300)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |       round(list_cosine_similarity(a.e, b.e), 4) AS sim
      |FROM v a JOIN v b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.e, b.e) > 0.3
      |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
    val v = embDouble(s, d).filter(col("vec_id") < 300).select("vec_id", "e")
    val a = v.select(col("vec_id").as("vec_a"), col("e").as("ea"))
    val b = v.select(col("vec_id").as("vec_b"), col("e").as("eb"))
    val sim = cos(col("ea"), col("eb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("sim_raw", sim)
      .filter(col("sim_raw") > 0.3)
      .select(col("vec_a"), col("vec_b"), round(col("sim_raw"), 4).as("sim"))
      .orderBy("vec_a", "vec_b")
  }

  // q26 — IVF-style ANN: vectors 0..7 serve as deterministic "trained"
  // centroids; every vector is assigned to its max-dot-product centroid
  // (one linear pass against a broadcast centroid table); the probe for
  // query vec_id = 0 then searches ONLY its centroid's bucket. This is the
  // partition-pruning form of inverted-file search.
  val q26AnnIvf: QueryDef = QueryDef.sql(
    "q26_ann_ivf",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
      |assign AS (
      |  SELECT vec_id, cid, e FROM (
      |    SELECT v.vec_id, c.cid, v.e,
      |           row_number() OVER (PARTITION BY v.vec_id
      |             ORDER BY list_dot_product(v.e, c.ce) DESC, c.cid) AS rn
      |    FROM v, c) WHERE rn = 1),
      |qc AS (SELECT cid AS qcid, e AS qe FROM assign WHERE vec_id = 0)
      |SELECT a.vec_id, round(list_cosine_similarity(a.e, qc.qe), 4) AS sim
      |FROM assign a, qc
      |WHERE a.cid = qc.qcid AND a.vec_id <> 0
      |ORDER BY list_cosine_similarity(a.e, qc.qe) DESC, a.vec_id
      |LIMIT 10""".stripMargin) { (s, d) =>
    val v = embDouble(s, d).select("vec_id", "e")
    val c = v.filter(col("vec_id") < 8).select(col("vec_id").as("cid"), col("e").as("ce"))
    // argmax via a map-side max(struct(dot, -cid)) partial aggregate: the
    // shuffle carries one row per vector, not one per (vector, centroid) —
    // 8× less than the row_number-window formulation, same deterministic
    // tie-break (highest dot, then lowest centroid id).
    val assign = v.crossJoin(broadcast(c))
      .select(col("vec_id"), col("e"), col("cid"),
        VectorOps.dot(col("e"), col("ce")).as("dot"))
      .groupBy("vec_id")
      .agg(
        max(struct(col("dot"), (-col("cid")).as("negcid"))).as("m"),
        first(col("e")).as("e"))
      .select(col("vec_id"), (-col("m.negcid")).as("cid"), col("e"))
    val qc = assign.filter(col("vec_id") === 0)
      .select(col("cid").as("qcid"), col("e").as("qe"))
    assign.join(broadcast(qc), col("cid") === col("qcid"))
      .filter(col("vec_id") =!= 0)
      .withColumn("sim_raw", cos(col("e"), col("qe")))
      .orderBy(col("sim_raw").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("sim_raw"), 4).as("sim"))
  }

  val all: Seq[QueryDef] = Seq(q18Similarity, q25EmbeddingNearDup, q26AnnIvf)
}
