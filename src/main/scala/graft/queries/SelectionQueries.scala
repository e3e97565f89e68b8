package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Graph, IntHash, Stats, TextOps}
import graft.queries.Q._

/** Data-selection surface: Moore–Lewis cross-entropy domain selection,
  * deterministic unigram^0.75 negative sampling, and neighborhood link
  * prediction. All hash-oracled against DuckDB twins (the negative
  * sampler replays its IntHash draws and integer CDF exactly).
  */
object SelectionQueries {

  /** DuckDB whitespace tokenizer matching Spark's
    * `split(trim(text), "\\s+")` + empty filter. */
  private val duckToks =
    "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"

  val queries: Map[String, QueryFn] = Map(
    "text_moore_lewis" -> ((s, dir) =>
      // Domain selection: in-domain = src0 docs, general pool = the
      // rest; both add-1 unigram LMs share the joint vocabulary. Docs
      // with positive ml_score look like src0.
      TextOps.crossEntropyDiff(table(s, dir, "documents"), "doc_id",
          col("text"), col("source") === "src0")
        .where(col("doc_id") < 150)
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logp_in"), 6).as("avg_logp_in"),
          round(col("avg_logp_out"), 6).as("avg_logp_out"),
          round(col("ml_score"), 6).as("ml_score"))
        .orderBy("doc_id")),

    "sample_negatives" -> ((s, dir) => {
      // 4 deterministic negatives per anchor doc from the top-64
      // count^0.75 vocabulary — hash-replayed draws, integer CDF.
      val docs = table(s, dir, "documents")
      Stats.negativeSample(docs, col("text"),
          docs.where(col("doc_id") < 200), col("doc_id"),
          vocabSize = 64, k = 4, seed = 7L)
        .orderBy("id", "slot")
    }),

    "graph_linkpred" -> ((s, dir) => {
      // Missing-edge candidates on the 40-node pagerank graph: top
      // pairs by shared neighborhood, with Adamic–Adar and Jaccard.
      val edges = table(s, dir, "events").where(col("event_id") < 3000)
        .select((col("user_id") % 40).as("u"),
          ((col("user_id") % 40 + 1 + col("event_id") % 11) % 40).as("v"))
        .distinct()
      Graph.linkPrediction(edges, "u", "v")
        .select(col("a"), col("b"), col("common_neighbors"),
          round(col("adamic_adar"), 6).as("adamic_adar"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("common_neighbors").desc, col("a"), col("b"))
        .limit(60)
    }),

    "graph_walks" -> ((s, dir) => {
      // DeepWalk corpus: 2 deterministic 4-step walks per node on the
      // directed 40-node graph — IntHash-replayed neighbor choices.
      val edges = table(s, dir, "events").where(col("event_id") < 3000)
        .select((col("user_id") % 40).as("u"),
          ((col("user_id") % 40 + 1 + col("event_id") % 11) % 40).as("v"))
      Graph.randomWalks(edges, "u", "v", walkLen = 4, walksPerNode = 2,
          seed = 11L)
        .orderBy("start", "walk", "step")
    }),

    "graph_walks_node2vec" -> ((s, dir) => {
      // node2vec biased walks on the same graph: p = 0.25 (return-
      // happy), q = 4 (BFS-ish) — the second-order sampler, integer
      // weight grid, IntHash-replayed.
      val edges = table(s, dir, "events").where(col("event_id") < 3000)
        .select((col("user_id") % 40).as("u"),
          ((col("user_id") % 40 + 1 + col("event_id") % 11) % 40).as("v"))
      Graph.node2vecWalks(edges, "u", "v", walkLen = 3, walksPerNode = 2,
          p = 0.25, q = 4.0, seed = 13L)
        .orderBy("start", "walk", "step")
    })
  )

  val oracle: Map[String, String] = Map(
    "text_moore_lewis" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source = 'src0' AS ind,
         |         unnest($duckToks) AS token
         |  FROM documents),
         |c AS (SELECT token,
         |        sum(CASE WHEN ind THEN 1 ELSE 0 END) AS c_in,
         |        sum(CASE WHEN ind THEN 0 ELSE 1 END) AS c_out
         |      FROM toks GROUP BY 1),
         |t AS (SELECT CAST(sum(c_in) AS BIGINT) AS n_in,
         |        CAST(sum(c_out) AS BIGINT) AS n_out,
         |        count(*) AS v FROM c),
         |lp AS (SELECT token,
         |         ln((c_in + 1.0) / (n_in + v)) AS lp_in,
         |         ln((c_out + 1.0) / (n_out + v)) AS lp_out
         |       FROM c CROSS JOIN t),
         |sc AS (SELECT doc_id, count(*) AS n_tokens,
         |         avg(lp_in) AS a_in, avg(lp_out) AS a_out
         |       FROM toks JOIN lp USING (token) GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  round(a_in, 6) AS avg_logp_in, round(a_out, 6) AS avg_logp_out,
         |  round(a_in - a_out, 6) AS ml_score
         |FROM sc WHERE doc_id < 150 ORDER BY doc_id""".stripMargin,

    "sample_negatives" -> {
      val u = IntHash.mixSql("7", Seq("id", "slot"))
      s"""WITH toks AS (SELECT unnest($duckToks) AS token FROM documents),
         |cnt AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
         |v AS (SELECT token, cnt,
         |        CAST(round(sqrt(cnt * sqrt(cnt)) * 1024) AS BIGINT) AS w
         |      FROM cnt ORDER BY cnt DESC, token LIMIT 64),
         |c AS (SELECT token,
         |        CAST(sum(w) OVER (ORDER BY cnt DESC, token
         |          ROWS UNBOUNDED PRECEDING) - w AS BIGINT) AS lo,
         |        CAST(sum(w) OVER (ORDER BY cnt DESC, token
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
         |      FROM v),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM v),
         |anchors AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200),
         |slots AS (SELECT id, CAST(j AS BIGINT) AS slot
         |          FROM anchors CROSS JOIN
         |            (SELECT unnest(range(1, 5)) AS j)),
         |draws AS (SELECT id, slot, ($u) % total AS u
         |          FROM slots CROSS JOIN tot)
         |SELECT id, slot, c.token AS neg_token
         |FROM draws JOIN c ON u >= lo AND u < hi
         |ORDER BY id, slot""".stripMargin
    },

    "graph_linkpred" ->
      """WITH e0 AS (
        |  SELECT DISTINCT
        |    least(user_id % 40, (user_id % 40 + 1 + event_id % 11) % 40) AS a,
        |    greatest(user_id % 40, (user_id % 40 + 1 + event_id % 11) % 40) AS b
        |  FROM events WHERE event_id < 3000),
        |und AS (SELECT a, b FROM e0 WHERE a <> b),
        |adj AS (SELECT a AS node, b AS nbr FROM und
        |        UNION ALL SELECT b, a FROM und),
        |deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
        |cen AS (SELECT adj.node, adj.nbr, deg.deg
        |        FROM adj JOIN deg USING (node) WHERE deg <= 10000),
        |wed AS (SELECT c1.node, c1.nbr AS pa, c2.nbr AS pb, c1.deg
        |        FROM cen c1 JOIN cen c2
        |          ON c1.node = c2.node AND c1.nbr < c2.nbr),
        |sc AS (SELECT pa AS a, pb AS b, count(*) AS common_neighbors,
        |         sum(1.0 / ln(CAST(deg AS DOUBLE))) AS aa
        |       FROM wed GROUP BY 1, 2),
        |ne AS (SELECT * FROM sc WHERE NOT EXISTS (
        |         SELECT 1 FROM und WHERE und.a = sc.a AND und.b = sc.b)),
        |-- CAPPED degrees (neighbors that survived the hub cut), the
        |-- same set the wedge numerator counted — mirrors the op's
        |-- internally-consistent jaccard union (full degrees here would
        |-- silently diverge the moment a fixture grows a hub)
        |cdeg AS (SELECT nbr AS node, count(*) AS deg FROM cen GROUP BY 1),
        |j AS (SELECT ne.a, ne.b, ne.common_neighbors, ne.aa,
        |        da.deg AS dda, db.deg AS ddb
        |      FROM ne JOIN cdeg da ON da.node = ne.a
        |              JOIN cdeg db ON db.node = ne.b)
        |SELECT a, b, common_neighbors, round(aa, 6) AS adamic_adar,
        |  round(CAST(common_neighbors AS DOUBLE)
        |    / (dda + ddb - common_neighbors), 6) AS jaccard
        |FROM j ORDER BY common_neighbors DESC, a, b LIMIT 60""".stripMargin,

    "graph_walks" -> {
      val mix = IntHash.mixSql("11",
        Seq("wk.start", "wk.walk", "(wk.step + 1)", "wk.cur"))
      s"""WITH RECURSIVE e0 AS (
         |  SELECT DISTINCT user_id % 40 AS u,
         |    (user_id % 40 + 1 + event_id % 11) % 40 AS v
         |  FROM events WHERE event_id < 3000),
         |e1 AS (SELECT u, v FROM e0 WHERE u <> v),
         |adj AS (SELECT u AS node, v AS nbr,
         |          row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS idx
         |        FROM e1),
         |deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
         |-- explicit DISTINCT: inside a WITH RECURSIVE clause DuckDB does
         |-- not apply plain UNION's dedup to non-recursive CTEs
         |starts AS (SELECT DISTINCT node FROM
         |  (SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)),
         |walk(start, walk, step, cur) AS (
         |  SELECT node, CAST(w AS BIGINT), CAST(0 AS BIGINT), node
         |  FROM starts CROSS JOIN (SELECT unnest(range(1, 3)) AS w)
         |  UNION ALL
         |  SELECT wk.start, wk.walk, wk.step + 1, adj.nbr
         |  FROM walk wk
         |  JOIN deg ON deg.node = wk.cur
         |  JOIN adj ON adj.node = wk.cur AND adj.idx = (($mix) % deg.deg)
         |  WHERE wk.step < 4)
         |SELECT start, walk, step, cur AS node FROM walk
         |ORDER BY start, walk, step""".stripMargin
    },

    "graph_walks_node2vec" -> {
      // staged unroll (windows are illegal inside a recursive CTE):
      // stage 1 is the uniform hop, stages 2..L the (prev, cur)-biased
      // integer-range pick. wRet = round(1024/0.25), wOut = round(1024/4).
      val (wRet, grid, wOut) = (4096L, 1024L, 256L)
      val u1 = IntHash.mixSql("13", Seq("f.start", "f.walk", "1", "f.cur"))
      val stages = (2 to 3).map { t =>
        val u = IntHash.mixSql("13",
          Seq("start", "walk", t.toString, "cur", "prev"))
        s"""cands$t AS (
           |  SELECT f.start, f.walk, f.prev, f.cur, a.nbr, a.idx,
           |    CASE WHEN a.nbr = f.prev THEN $wRet
           |         WHEN e.nbr IS NOT NULL THEN $grid
           |         ELSE $wOut END AS w
           |  FROM st${t - 1} f
           |  JOIN adj a ON a.node = f.cur
           |  LEFT JOIN adj e ON e.node = f.prev AND e.nbr = a.nbr),
           |rng$t AS (
           |  SELECT *,
           |    CAST(sum(w) OVER (PARTITION BY start, walk ORDER BY idx
           |      ROWS UNBOUNDED PRECEDING) - w AS BIGINT) AS lo,
           |    CAST(sum(w) OVER (PARTITION BY start, walk ORDER BY idx
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi,
           |    CAST(sum(w) OVER (PARTITION BY start, walk) AS BIGINT)
           |      AS tot
           |  FROM cands$t),
           |st$t AS (
           |  SELECT start, walk, cur AS prev, nbr AS cur
           |  FROM rng$t
           |  WHERE ($u) % tot >= lo AND ($u) % tot < hi)""".stripMargin
      }.mkString(",\n|")
      s"""WITH e0 AS (
         |  SELECT DISTINCT user_id % 40 AS u,
         |    (user_id % 40 + 1 + event_id % 11) % 40 AS v
         |  FROM events WHERE event_id < 3000),
         |e1 AS (SELECT u, v FROM e0 WHERE u <> v),
         |adj AS (SELECT u AS node, v AS nbr,
         |          row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS idx
         |        FROM e1),
         |deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
         |starts AS (SELECT DISTINCT node FROM
         |  (SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)),
         |s0 AS (SELECT node AS start, CAST(w AS BIGINT) AS walk,
         |         node AS cur
         |       FROM starts CROSS JOIN (SELECT unnest(range(1, 3)) AS w)),
         |st1 AS (
         |  SELECT f.start, f.walk, f.cur AS prev, a.nbr AS cur
         |  FROM s0 f
         |  JOIN deg d ON d.node = f.cur
         |  JOIN adj a ON a.node = f.cur AND a.idx = (($u1) % d.deg)),
         |$stages
         |SELECT start, walk, CAST(0 AS BIGINT) AS step, cur AS node FROM s0
         |UNION ALL SELECT start, walk, 1, cur FROM st1
         |UNION ALL SELECT start, walk, 2, cur FROM st2
         |UNION ALL SELECT start, walk, 3, cur FROM st3
         |ORDER BY start, walk, step""".stripMargin
    }
  )
}
