package graft

/** DuckDB oracle SQL — one entry per [[Queries.registry]] key (minus the
  * rows-only operators the driver checks without an oracle).
  *
  * Mirrors the Spark queries' arithmetic exactly: decimal-cast sums cast back
  * to double, manually-expanded stddev, unrolled left-associated 64-term
  * vector folds — so both engines produce bit-identical doubles and the
  * driver's hash compare is stable.
  */
object OracleSql {

  // -- exact-sum helpers (twins of Queries.dsum/lsum/lmean/lstd) -----------
  // lsum: quantize to 6dp with floor(x*1e6+0.5), sum the exact integers
  // (DuckDB sums BIGINT as HUGEINT — still exact), divide once. Identical
  // IEEE ops to the Spark twin, so bit-identical doubles.
  // dsumSq: 6dp integer quantization, exact DECIMAL(19,0)^2 products — a
  // double->decimal cast of x*x is NOT portable (Spark rounds the shortest
  // string repr, DuckDB the exact binary value), so quantize first and keep
  // every step integer-exact; see the Queries.dsumSq twin
  private def dsumSq(x: String) =
    s"(CAST(SUM(CAST(CAST(floor(($x)*1000000.0 + 0.5) AS DECIMAL(19,0)) * " +
      s"CAST(floor(($x)*1000000.0 + 0.5) AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DOUBLE) / 1000000000000.0)"
  // parenthesized: lsum is a quotient, so embedding it in a larger * / chain
  // without parens would re-associate the division (SQL * and / are
  // left-associative) and drift the last ulp vs the Spark twin
  private def lsum(x: String) =
    s"(CAST(SUM(CAST(floor(($x)*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)"
  private def lmean(x: String) = s"${lsum(x)} / count($x)"
  private def lstd(x: String) =
    s"sqrt((${dsumSq(x)} - ${lsum(x)}*${lsum(x)}/count($x)) / (count($x) - 1))"

  // -- per-column drift block (twin of Drift.numericDriftMulti) ------------
  // one column's zero-filled per-bin evidence between the two l_shipdate
  // halves of lineitem; the row's oracle UNION ALLs one block per spec
  private def driftColSql(c: String, lo: Double, hi: Double, n: Int): String = {
    val w = (hi - lo) / n
    s"""SELECT '$c' AS col_name, bins.bin,
       |  CAST(COALESCE(ac.cnt_a, 0) AS BIGINT) AS cnt_a,
       |  CAST(COALESCE(bc.cnt_b, 0) AS BIGINT) AS cnt_b,
       |  CASE WHEN t.ta > 0 THEN CAST(COALESCE(ac.cnt_a, 0) AS DOUBLE) / t.ta ELSE 0.0 END AS share_a,
       |  CASE WHEN t.tb > 0 THEN CAST(COALESCE(bc.cnt_b, 0) AS DOUBLE) / t.tb ELSE 0.0 END AS share_b
       |FROM (SELECT unnest(generate_series(0, ${n - 1})) AS bin) bins
       |LEFT JOIN (SELECT LEAST(GREATEST(CAST(floor(($c - $lo) / $w) AS BIGINT), 0), ${n - 1}) AS bin,
       |             count(*) AS cnt_a
       |           FROM lineitem WHERE $c IS NOT NULL
       |             AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1) ac
       |  ON bins.bin = ac.bin
       |LEFT JOIN (SELECT LEAST(GREATEST(CAST(floor(($c - $lo) / $w) AS BIGINT), 0), ${n - 1}) AS bin,
       |             count(*) AS cnt_b
       |           FROM lineitem WHERE $c IS NOT NULL
       |             AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1) bc
       |  ON bins.bin = bc.bin
       |CROSS JOIN (SELECT
       |    SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01 00:00:00' THEN 1 ELSE 0 END) AS ta,
       |    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' THEN 1 ELSE 0 END) AS tb
       |  FROM lineitem WHERE $c IS NOT NULL) t""".stripMargin
  }

  // -- unrolled 64-dim vector math (twin of VectorFunctions fold order) ----
  private def dotSql(a: String, b: String): String =
    (1 to 64).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")
  private def normSql(a: String): String =
    "sqrt(" + (1 to 64).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($a[$i] AS DOUBLE)").mkString(" + ") + ")"
  private def cosSql(a: String, b: String): String =
    s"CASE WHEN ${normSql(a)} * ${normSql(b)} > 0 THEN (${dotSql(a, b)}) / (${normSql(a)} * ${normSql(b)}) ELSE NULL END"

  // rp1's sign rows (twin of Similarity.rpSigns / signProject fold order):
  // the ±1.0 coefficients are emitted as literals so the oracle SQL stays
  // self-contained; the sum is the same left-associated 64-term chain
  private lazy val rpSignRows = graft.operators.Similarity.rpSigns(16, 64)
  private def rpProjSql(vec: String, k: Int): String =
    rpSignRows(k).zipWithIndex.map { case (s, j) =>
      s"($s)*CAST($vec[${j + 1}] AS DOUBLE)"
    }.mkString(" + ")

  private val tokSplit = """string_split_regex(trim(text), '\s+')"""

  // -- shared text-metric fragments (twins of TextFunctions) ---------------
  // quality: the exact qualityScoreFromToks formula (t2's hash-green twin)
  private val qualitySql: String = {
    val lenScore = "least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)"
    val divScore =
      s"CASE WHEN len($tokSplit) > 0 THEN CAST(len(list_distinct($tokSplit)) AS DOUBLE) / len($tokSplit) ELSE 0.0 END"
    val punctRatio =
      """CASE WHEN length(text) > 0 THEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) ELSE 0.0 END"""
    val punctPenalty = s"greatest(0.0, 1.0 - ($punctRatio) * 5.0)"
    s"round(($lenScore) * 0.4 + ($divScore) * 0.4 + ($punctPenalty) * 0.2, 6)"
  }
  private val nTokensSql: String =
    """CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)"""
  // language-ID marker scores + argmax (t3's hash-green twin); langScoreCols
  // emits one `... AS s_<lang>` per language, langPredSql reads them
  private val langNames: Seq[String] =
    graft.functions.TextFunctions.LangMarkers.toSeq.sortBy(_._1).map(_._1)
  private val langScoreCols: String = {
    def score(markers: Seq[String]) = {
      val list = markers.map(m => s"'$m'").mkString("[", ", ", "]")
      s"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), tk -> list_contains($list, tk)))"
    }
    graft.functions.TextFunctions.LangMarkers.toSeq.sortBy(_._1)
      .map { case (l, m) => s"${score(m)} AS s_$l" }.mkString(",\n  ")
  }
  private val langPredSql: String = {
    val winner = langNames.map { l =>
      val geq = langNames.filterNot(_ == l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $geq THEN '$l'"
    }.mkString("CASE ", " ", " END")
    val best = s"greatest(${langNames.map(l => s"s_$l").mkString(", ")})"
    s"CASE WHEN $best > 0 THEN ($winner) ELSE 'und' END"
  }
  // distinct word-trigram set of `text` (d2b's hash-green shingle twin)
  private val trigramSetSql: String =
    s"""list_distinct(list_transform(
       |    list_zip(toks[1:len(toks)-2], toks[2:len(toks)-1], toks[3:len(toks)]),
       |    x -> x[1] || ' ' || x[2] || ' ' || x[3]))""".stripMargin
  // distinct word 5-gram set (dc1's decontamination shingle twin)
  private val fivegramSetSql: String =
    s"""list_distinct(list_transform(
       |    list_zip(toks[1:len(toks)-4], toks[2:len(toks)-3], toks[3:len(toks)-2],
       |             toks[4:len(toks)-1], toks[5:len(toks)]),
       |    x -> x[1] || ' ' || x[2] || ' ' || x[3] || ' ' || x[4] || ' ' || x[5]))""".stripMargin

  // -- BPE replay (tok1/mix2b/sq1b twins of functions.BpeVocab) -------------
  // The kernel runs lowest-rank-first greedy merging; over a valid table
  // (every merge's components are single code points or outputs of STRICTLY
  // earlier merges — enforced by BpeVocab.Table) that equals applying merges
  // in ascending rank order, each exhaustively: a merge's pair can never be
  // re-created by a later merge, because the later merge's output token is
  // new. One exhaustive application over the separator-wrapped token string
  // is TWO non-overlapping replace() passes: a matched occurrence consumes
  // the separator the next ADJACENT occurrence needs, but missed occurrences
  // are never adjacent to each other, so the second pass catches every
  // leftover. The tokenizer is therefore 2·M nested replaces in rank order,
  // generated from the SAME committed Fixture the Spark kernel evaluates.
  private val bpeSep = "\u001f" // unit separator: absent from any corpus text
  private def bpeEsc(s: String) = s.replace("'", "''")
  private val bpeApplySql: String =
    graft.functions.BpeVocab.Fixture.foldLeft("s") { case (acc, (a, b)) =>
      val pat = s"'$bpeSep${bpeEsc(a)}$bpeSep${bpeEsc(b)}$bpeSep'"
      val rep = s"'$bpeSep${bpeEsc(a)}${bpeEsc(b)}$bpeSep'"
      s"replace(replace($acc,$pat,$rep),$pat,$rep)"
    }
  // per-DISTINCT-word BPE token counts over `documents` (the word list is
  // tiny next to the corpus); join back on the word stream to denominate
  // any metric in BPE tokens
  private val bpeCntCtes: String =
    s"""bpew AS (SELECT DISTINCT unnest($tokSplit) AS w FROM documents),
       |bpes AS (SELECT w,
       |  '$bpeSep' || array_to_string(string_split(w,''), '$bpeSep') || '$bpeSep' AS s
       |  FROM bpew),
       |bpec AS (SELECT w, CASE WHEN w = '' THEN CAST(0 AS BIGINT)
       |    ELSE CAST(len(s) - len(replace(s, '$bpeSep', '')) - 1 AS BIGINT) END AS bpe_n
       |  FROM (SELECT w, $bpeApplySql AS s FROM bpes))""".stripMargin

  // cp5's staged chain, shared by the cp5/cp5b twins: gates (t2/t3
  // formulas) -> duplicated-span rewrite over the GATED corpus (sr1's
  // window machinery) -> metadata recomputed on the rewritten text +
  // gates re-applied (including lang) -> md5 min-id exact dedup -> exact
  // all-pairs trigram keep-first near-dedup -> survivor set `fin`.
  private def cp5ChainSql: String =
    s"""WITH sc AS (SELECT doc_id, text,
       |    $qualitySql AS quality,
       |    $nTokensSql AS n_tokens,
       |  $langScoreCols
       |  FROM documents),
       |meta AS (SELECT doc_id, text, quality, n_tokens,
       |    $langPredSql AS lang
       |  FROM sc),
       |gated AS (SELECT doc_id, text FROM meta
       |  WHERE n_tokens BETWEEN 5 AND 100000 AND quality >= 0.3),
       |t AS (SELECT doc_id, $tokSplit AS toks FROM gated),
       |sp0 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 6
       |        THEN list_transform(range(1, len(toks) - 6 + 2),
       |          i -> {'pos': i, 'span': array_to_string(toks[i:i+5], ' ')})
       |        ELSE [] END) AS u FROM t),
       |s2 AS (SELECT doc_id, u.pos AS pos, u.span AS span FROM sp0),
       |w AS (SELECT doc_id, pos,
       |        count(*) OVER (PARTITION BY span) AS n,
       |        row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
       |      FROM s2),
       |rm AS (SELECT DISTINCT doc_id, pos + off AS tpos
       |       FROM w CROSS JOIN range(0, 6) o(off)
       |       WHERE n >= 2 AND rn > 1),
       |tok AS (SELECT doc_id, u.tpos AS tpos, u.tok AS tok FROM
       |        (SELECT doc_id, unnest(list_transform(range(1, len(toks)+1),
       |           i -> {'tpos': i, 'tok': toks[i]})) AS u FROM t)),
       |kept AS (SELECT tok.doc_id, tok.tpos, tok.tok FROM tok
       |         LEFT JOIN rm ON tok.doc_id = rm.doc_id AND tok.tpos = rm.tpos
       |         WHERE rm.doc_id IS NULL),
       |rw AS (SELECT t.doc_id, coalesce(re.clean_text, '') AS text
       |       FROM t LEFT JOIN (
       |         SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text
       |         FROM kept GROUP BY doc_id) re USING (doc_id)),
       |sc2 AS (SELECT doc_id, text,
       |    $qualitySql AS quality,
       |    $nTokensSql AS n_tokens,
       |  $langScoreCols
       |  FROM rw),
       |meta2 AS (SELECT doc_id, text, quality, n_tokens,
       |    $langPredSql AS lang
       |  FROM sc2),
       |gated2 AS (SELECT * FROM meta2
       |  WHERE n_tokens BETWEEN 5 AND 100000 AND quality >= 0.3),
       |fp AS (SELECT doc_id, text, quality, n_tokens, lang,
       |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
       |  FROM gated2),
       |exact AS (SELECT * FROM fp
       |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
       |shx AS (SELECT doc_id, $trigramSetSql AS sh
       |  FROM (SELECT doc_id, $tokSplit AS toks FROM exact)),
       |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
       |      THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |      ELSE 0.0 END AS j
       |  FROM shx a JOIN shx b ON a.doc_id < b.doc_id),
       |fin AS (SELECT doc_id, lang, n_tokens, quality FROM exact
       |  WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs WHERE j >= 0.9))""".stripMargin

  private val sql0: Map[String, String] = Map(
    // -------------------------------------------------------- profiling
    "p2_shape" ->
      """SELECT * FROM (
        |  SELECT 'lineitem' AS tbl, count(*) AS n_rows FROM lineitem UNION ALL
        |  SELECT 'orders', count(*) FROM orders UNION ALL
        |  SELECT 'customer', count(*) FROM customer UNION ALL
        |  SELECT 'documents', count(*) FROM documents) ORDER BY tbl""".stripMargin,

    // total-order sort — (l_orderkey, l_linenumber) is not unique, and a
    // head over a partial order is engine-dependent
    "p3_head" ->
      """SELECT * FROM lineitem ORDER BY l_orderkey, l_partkey, l_suppkey,
        |l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        |l_returnflag, l_linestatus, l_shipdate LIMIT 5""".stripMargin,

    "p5_describe" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, count($c) AS n, ${lmean(c)} AS mean, ${lstd(c)} AS std,
           |min($c) AS min_v, quantile_cont($c, 0.5) AS median, max($c) AS max_v FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount").map(one)
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
    },

    "p6_nullcounts" ->
      """SELECT
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orderkey,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_custkey,
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orderstatus,
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_totalprice,
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orderdate,
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orderpriority
        |FROM orders""".stripMargin,

    "p7_extremes" ->
      """SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |  count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem""".stripMargin,

    "p8_dupcheck" ->
      """SELECT count(*) AS n_dup_groups FROM
        |  (SELECT text FROM documents GROUP BY text HAVING count(*) > 1)""".stripMargin,

    "p9_value_counts" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority""".stripMargin,

    // -------------------------------------------------- agg / join / window
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${lsum("l_quantity")} AS sum_qty,
         |  ${lsum("l_extendedprice")} AS sum_base_price,
         |  ${lsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${lsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${lmean("l_quantity")} AS avg_qty,
         |  ${lmean("l_extendedprice")} AS avg_price,
         |  ${lmean("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_revenue" ->
      s"""SELECT l_orderkey, ${lsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
         |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      s"""SELECT n_name, ${lsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name,
         |  ${lsum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // q14: both conditional exact sums in one grouped scan, one IEEE
    // share division, 6dp quantize
    "q14_promo_share" ->
      s"""WITH g AS (SELECT
         |    CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS yyyymm,
         |    ${lsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
         |      AS promo_revenue,
         |    ${lsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1)
         |SELECT yyyymm, promo_revenue, total_revenue,
         |  floor(promo_revenue / total_revenue * 100 * 1e6 + 0.5) / 1e6
         |    AS promo_share
         |FROM g ORDER BY yyyymm""".stripMargin,

    "q18_large_orders" ->
      s"""WITH big AS (SELECT l_orderkey,
         |    ${lsum("l_quantity")} AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${lsum("l_quantity")} > 200.0)
         |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
         |  total_qty
         |FROM big
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q6_forecast" ->
      s"""SELECT ${lsum("l_extendedprice * l_discount")} AS revenue, count(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q_semijoin" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY s_suppkey""".stripMargin,

    "q_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_setops" ->
      """WITH b98 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
        |b99 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00')
        |SELECT o_custkey, cohort FROM (
        |  SELECT o_custkey, 'churned' AS cohort FROM (SELECT * FROM b98 EXCEPT SELECT * FROM b99)
        |  UNION ALL
        |  SELECT o_custkey, 'repeat' FROM (SELECT * FROM b98 INTERSECT SELECT * FROM b99))
        |ORDER BY cohort, o_custkey""".stripMargin,

    "q_above_own_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    (CAST(SUM(CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT))
        |        OVER (PARTITION BY o_custkey) AS DOUBLE) / 100.0)
        |      / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
        |  FROM orders)
        |WHERE o_totalprice > cust_avg ORDER BY o_orderkey""".stripMargin,

    "w1_topk_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "w2_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(floor(l_quantity*100.0 + 0.5) AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_qty
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "w3_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "w4_asof_join" ->
      """WITH od AS (
        |  SELECT o_custkey, o_orderdate,
        |    max(o_orderkey) AS o_orderkey,
        |    arg_max(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id,
        |  od.o_orderkey AS asof_o_orderkey, od.o_totalprice AS asof_o_totalprice
        |FROM events e ASOF LEFT JOIN od
        |  ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "w5_range_window" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS sec FROM orders)
        |SELECT o_orderkey,
        |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY sec
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS trailing_n,
        |  CAST(SUM(CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT)) OVER (
        |    PARTITION BY o_orderpriority ORDER BY sec
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS trailing_spend
        |FROM o ORDER BY o_orderkey""".stripMargin,

    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${lsum("l_extendedprice")} AS sum_price, count(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${lsum("l_extendedprice")} AS sum_price, count(*) AS n
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "e1_hourly_totals" ->
      s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |  count(*) AS n_events, ${lsum("value")} AS total_value
         |FROM events GROUP BY hour_start, event_type ORDER BY hour_start, event_type""".stripMargin,

    "e2_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        |FROM events ORDER BY event_id""".stripMargin,

    // ------------------------------------------------------------ cleaning
    "c1_impute_median" ->
      """WITH b AS (SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity > 45 THEN NULL ELSE l_quantity END AS qty FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  COALESCE(qty, (SELECT quantile_cont(qty, 0.5) FROM b)) AS qty_filled
        |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "c2_impute_mean" ->
      s"""WITH b AS (SELECT o_orderkey,
         |  CASE WHEN o_totalprice > 300000 THEN NULL ELSE o_totalprice END AS price FROM orders)
         |SELECT o_orderkey, COALESCE(price, (SELECT ${lmean("price")} FROM b)) AS price_filled
         |FROM b ORDER BY o_orderkey""".stripMargin,

    "c3_impute_mode" ->
      """WITH b AS (SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_tax > 0.07 THEN NULL ELSE l_returnflag END AS flag FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  COALESCE(flag, (SELECT flag FROM b WHERE flag IS NOT NULL
        |    GROUP BY flag ORDER BY count(*) DESC, flag LIMIT 1)) AS flag_filled
        |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "c4_impute_derived" ->
      """WITH b AS (SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderdate END AS odate FROM orders)
        |SELECT o_orderkey, COALESCE(odate, (SELECT min(odate) FROM b)) AS odate_filled
        |FROM b ORDER BY o_orderkey""".stripMargin,

    "c5_drop_nulls" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem
        |WHERE NOT (l_quantity > 45) ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "c6_zscore_filter" ->
      s"""WITH s AS (SELECT ${lsum("o_totalprice")} AS sx, ${dsumSq("o_totalprice")} AS sxx,
         |  count(o_totalprice) AS n FROM orders)
         |SELECT o_orderkey, o_totalprice FROM orders, s
         |WHERE abs(o_totalprice - sx/n) <= 3 * sqrt((sxx - sx*sx/n)/(n - 1))
         |ORDER BY o_orderkey""".stripMargin,

    // c6b: median/MAD fence — quantile_cont twins the bracket-and-refine
    // exact quantiles bit-for-bit (the c1/c7 convention); null values pass
    "c6b_mad_filter" ->
      """WITH m AS (SELECT quantile_cont(value, 0.5) AS med FROM events),
        |d AS (SELECT quantile_cont(abs(value - m.med), 0.5) AS mad FROM events, m)
        |SELECT event_id, value FROM events, m, d
        |WHERE value IS NULL OR d.mad = 0.0
        |   OR abs(value - m.med) <= 3.0 * (1.4826 * d.mad)
        |ORDER BY event_id""".stripMargin,

    "c7_outlier_to_null" ->
      s"""WITH s AS (SELECT ${lsum("value")} AS sx, ${dsumSq("value")} AS sxx,
         |  count(value) AS n FROM events),
         |b AS (SELECT event_id,
         |  CASE WHEN abs(value - sx/n) > 3 * sqrt((sxx - sx*sx/n)/(n - 1))
         |    THEN NULL ELSE value END AS v FROM events, s)
         |SELECT event_id, COALESCE(v, (SELECT quantile_cont(v, 0.5) FROM b)) AS value_clean
         |FROM b ORDER BY event_id""".stripMargin,

    "c8_percentile_cap" ->
      """SELECT o_orderkey,
        |  least(o_totalprice, (SELECT quantile_cont(o_totalprice, 0.95) FROM orders)) AS price_capped
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "c9_dedup_keyed" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY lang, source)
        |ORDER BY doc_id""".stripMargin,

    "c10_normalize" ->
      """SELECT c_custkey, upper(trim(c_name)) AS name_norm,
        |  lower(c_mktsegment) AS segment_norm
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "c11_canonicalize" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'P' THEN 'PENDING'
        |       WHEN o_orderstatus = 'O' THEN 'OPEN'
        |       WHEN o_orderstatus = 'F' THEN 'FINISHED'
        |       ELSE o_orderstatus END AS status_canon,
        |  regexp_replace(o_orderpriority, '^[0-9]-', '') AS priority_clean
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "c12_booleanize" ->
      """SELECT event_id,
        |  CASE WHEN trim(event_type) IN ('purchase', 'signup') THEN TRUE
        |       WHEN trim(event_type) IN ('click', 'view', 'error') THEN FALSE
        |       ELSE NULL END AS is_conversion
        |FROM events ORDER BY event_id""".stripMargin,

    "c13_date_flag" ->
      """SELECT o_orderkey, o_orderdate > TIMESTAMP '2001-06-01 00:00:00' AS is_late,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "c14_sentinel" ->
      """SELECT o_orderkey,
        |  CASE WHEN trim(o_orderpriority) IN ('4-NOT SPECIFIED') THEN NULL
        |       ELSE o_orderpriority END AS priority_or_null
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // ---------------------------------------------------------------- text
    "t1_token_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct($tokSplit)) AS BIGINT) AS n_uniq_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_actual
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t2_quality" ->
      s"""SELECT doc_id,
         |  $qualitySql AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t3_langid" ->
      s"""WITH sc AS (SELECT doc_id,
         |  $langScoreCols
         |FROM documents)
         |SELECT doc_id, $langPredSql AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin,

    "t4_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t5_corpus_filter" ->
      s"""WITH q AS (SELECT doc_id, lang,
         |  $qualitySql AS quality,
         |  $nTokensSql AS n_tokens
         |FROM documents)
         |SELECT doc_id, lang, quality, n_tokens FROM q
         |WHERE quality >= 0.5 AND n_tokens >= 20 AND n_tokens <= 200
         |  AND lang IN ('en', 'de', 'fr')
         |ORDER BY doc_id""".stripMargin,

    "p10_group_insight" ->
      s"""SELECT c_mktsegment, count(*) AS n_customers,
         |  ${lmean("c_acctbal")} AS avg_balance,
         |  ${lstd("c_acctbal")} AS std_balance,
         |  min(c_acctbal) AS min_balance, max(c_acctbal) AS max_balance
         |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "t6_ngram_counts" ->
      s"""WITH t AS (SELECT $tokSplit AS toks FROM documents),
         |bg AS (SELECT list_distinct(list_transform(
         |    list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
         |    x -> x[1] || ' ' || x[2])) AS bigrams FROM t)
         |SELECT bigram, count(*) AS doc_freq
         |FROM (SELECT unnest(bigrams) AS bigram FROM bg)
         |GROUP BY bigram ORDER BY doc_freq DESC, bigram LIMIT 20""".stripMargin,

    // ------------------------------------------------------ dedup / vectors
    "d1_exact_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
        |fp AS (SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
        |  FROM all_docs)
        |SELECT min(doc_id) AS keep_id, count(*) AS group_size
        |FROM fp GROUP BY f HAVING count(*) > 1 ORDER BY keep_id""".stripMargin,

    // full MinHash-LSH twin: the 128-hash signatures are REBUILT in SQL
    // (portable MD5 base hash -> splitmix64 mixing emulated exactly in
    // wrapping u64 arithmetic via HUGEINT; per-band 16-hash slices joined on
    // equality = the banding collision), then candidates are verified with
    // the same trigram Jaccard >= 0.8. Hash equality proves the engine's
    // entire signature->band->verify plan bit-for-bit — the d3 pattern
    // applied to MinHash, retiring the last rows-only registry row.
    "d2_minhash_lsh" -> {
      val p64 = "CAST(18446744073709551616 AS HUGEINT)" // 2^64
      // first 16 hex chars of md5 -> unsigned 64-bit integer (HUGEINT)
      val hex2u = (0 until 16).map { j =>
        s"CAST(strpos('0123456789abcdef', substr(h,${j + 1},1)) - 1 AS HUGEINT)" +
          s" * CAST(power(2, ${4 * (15 - j)}) AS HUGEINT)"
      }.mkString(" + ")
      // (z * C) mod 2^64 via 32-bit limbs (the product of two u64 overflows
      // HUGEINT; limb products don't)
      def mulmod(z: String, c: Long): String = {
        val ch = java.lang.Long.toUnsignedString(c >>> 32)
        val cl = java.lang.Long.toUnsignedString(c & 0xFFFFFFFFL)
        s"((($z) % 4294967296) * $cl + (((($z) % 4294967296) * $ch + " +
          s"(($z) // 4294967296) * $cl) % 4294967296) * 4294967296) % $p64"
      }
      // per-function offsets g_j = Golden * (j+1), wrapping — precomputed
      // with Scala's own wrapping Long multiply, emitted as u64 literals
      val gjRows = (0 until 128).map { j =>
        val g = graft.functions.MinHashSig.Golden * (j + 1)
        s"($j, CAST('${java.lang.Long.toUnsignedString(g)}' AS HUGEINT))"
      }.mkString(",\n    ")
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
         |t AS (SELECT doc_id, $tokSplit AS toks FROM all_docs),
         |s AS (SELECT doc_id, $trigramSetSql AS sh FROM t),
         |shing AS (SELECT DISTINCT unnest(sh) AS sg FROM s),
         |hx AS (SELECT sg, md5(sg) AS h FROM shing),
         |base AS (SELECT sg, $hex2u AS u FROM hx),
         |gj(j, g) AS (VALUES
         |    $gjRows),
         |m0 AS (SELECT sg, j, xor(u, g) AS z FROM base, gj),
         |m1 AS (SELECT sg, j, (z + 11400714819323198485) % $p64 AS z FROM m0),
         |m2 AS (SELECT sg, j, xor(z, z // 1073741824) AS z FROM m1),
         |m3 AS (SELECT sg, j, ${mulmod("z", 0xBF58476D1CE4E5B9L)} AS z FROM m2),
         |m4 AS (SELECT sg, j, xor(z, z // 134217728) AS z FROM m3),
         |m5 AS (SELECT sg, j, ${mulmod("z", 0x94D049BB133111EBL)} AS z FROM m4),
         |m6 AS (SELECT sg, j, xor(z, z // 2147483648) AS z FROM m5),
         |hs AS (SELECT sg, j,
         |    CAST(CASE WHEN z >= CAST(power(2,63) AS HUGEINT)
         |      THEN z - $p64 ELSE z END AS BIGINT) AS hv
         |  FROM m6),
         |ds AS (SELECT doc_id, unnest(sh) AS sg FROM s),
         |sig AS (SELECT doc_id, j, min(hv) AS mh
         |  FROM ds JOIN hs USING (sg) GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // 16 AS band,
         |    string_agg(mh::VARCHAR, ',' ORDER BY j) AS bkey
         |  FROM sig GROUP BY doc_id, j // 16),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT id_a, id_b,
         |    CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
         |      THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         |      ELSE 0.0 END AS jaccard
         |  FROM cand JOIN s a ON cand.id_a = a.doc_id JOIN s b ON cand.id_b = b.doc_id)
         |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin
    },

    // exact all-pairs trigram Jaccard over the planted fixture: equality
    // with the banding-tuned LSH plan proves it recovers the corpus's
    // ~25 organic 0.9<=j<1 near-dup pairs plus the 50 planted exact dups
    "d2b_minhash_lsh_oracle" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
         |t AS (SELECT doc_id, $tokSplit AS toks FROM all_docs),
         |s AS (SELECT doc_id, list_distinct(list_transform(
         |    list_zip(toks[1:len(toks)-2], toks[2:len(toks)-1], toks[3:len(toks)]),
         |    x -> x[1] || ' ' || x[2] || ' ' || x[3])) AS sh FROM t)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
         |      THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         |      ELSE 0.0 END AS jaccard
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
         |WHERE jaccard >= 0.9 ORDER BY id_a, id_b""".stripMargin,

    // exact all-pairs 64-bit SimHash Hamming over the planted fixture.
    // The signature is rebuilt from scratch in SQL: token hash = first 16
    // hex chars of md5 -> unsigned 64-bit integer (HUGEINT digit sum), bit b
    // of the signature = sign of (2*ones_b - ntok), assembled as a HUGEINT
    // power-of-two sum and wrapped to signed BIGINT. Equality with the
    // Spark side proves both the portable MD5 token hash and that the
    // pigeonhole quarter-blocking plan recovers every pair at Hamming <= 3.
    "d3_simhash" -> {
      val hex2u = (0 until 16).map { j =>
        s"CAST(strpos('0123456789abcdef', substr(h,${j + 1},1)) - 1 AS HUGEINT)" +
          s" * CAST(power(2, ${4 * (15 - j)}) AS HUGEINT)"
      }.mkString(" + ")
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
         |tok AS (SELECT doc_id,
         |  unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tk
         |  FROM all_docs),
         |hx AS (SELECT doc_id, md5(tk) AS h FROM tok),
         |hv AS (SELECT doc_id, $hex2u AS u FROM hx),
         |nt AS (SELECT doc_id, count(*) AS ntok FROM hv GROUP BY doc_id),
         |bits AS (SELECT hv.doc_id, b.range AS b,
         |    SUM(CAST((u // CAST(power(2, b.range) AS HUGEINT)) % 2 AS HUGEINT)) AS ones
         |  FROM hv, range(64) b GROUP BY hv.doc_id, b.range),
         |sigu AS (SELECT bits.doc_id,
         |    SUM(CASE WHEN 2*ones - ntok > 0 THEN CAST(power(2, b) AS HUGEINT)
         |        ELSE CAST(0 AS HUGEINT) END) AS su
         |  FROM bits JOIN nt ON bits.doc_id = nt.doc_id GROUP BY bits.doc_id),
         |sig AS (SELECT doc_id,
         |    CAST(CASE WHEN su >= CAST(power(2,63) AS HUGEINT)
         |      THEN su - CAST(power(2,64) AS HUGEINT) ELSE su END AS BIGINT) AS s
         |  FROM sigu)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 3 ORDER BY id_a, id_b""".stripMargin
    },

    "d4_ngram_jaccard" ->
      s"""WITH s AS (SELECT doc_id, lang, source,
         |  list_distinct($tokSplit) AS sset FROM documents)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CASE WHEN CAST(len(a.sset) + len(b.sset) AS DOUBLE)
         |              - CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) > 0
         |      THEN CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
         |           / (CAST(len(a.sset) + len(b.sset) AS DOUBLE)
         |              - CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE))
         |      ELSE 0.0 END AS jaccard
         |  FROM s a JOIN s b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // d4b: asymmetric containment — one IEEE division of exact set sizes
    // per direction (no quantization needed); empty sets excluded so no
    // NaN; same block-local join as d4
    "d4b_ngram_containment" ->
      s"""WITH s AS (SELECT doc_id, lang, source, sset FROM (
         |    SELECT doc_id, lang, source,
         |      list_filter(list_distinct($tokSplit), x -> x <> '') AS sset
         |    FROM documents)
         |  WHERE len(sset) > 0)
         |SELECT id_a, id_b, contain_a_in_b, contain_b_in_a FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
         |      / CAST(len(a.sset) AS DOUBLE) AS contain_a_in_b,
         |    CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
         |      / CAST(len(b.sset) AS DOUBLE) AS contain_b_in_a
         |  FROM s a JOIN s b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
         |WHERE GREATEST(contain_a_in_b, contain_b_in_a) >= 0.8""".stripMargin,

    // the distributed min-label fixed point == the recursive reachability
    // closure's per-node minimum — components are partition-order-free
    "d7_neardup_components" ->
      s"""WITH RECURSIVE all_docs AS (SELECT doc_id, text, lang, source FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text, lang, source FROM documents WHERE doc_id < 50),
         |s AS (SELECT doc_id, lang, source,
         |  list_distinct($tokSplit) AS sset FROM all_docs),
         |e AS (SELECT id_a AS src, id_b AS dst FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CASE WHEN CAST(len(a.sset) + len(b.sset) AS DOUBLE)
         |              - CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) > 0
         |      THEN CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
         |           / (CAST(len(a.sset) + len(b.sset) AS DOUBLE)
         |              - CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE))
         |      ELSE 0.0 END AS jaccard
         |  FROM s a JOIN s b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
         |  WHERE jaccard >= 0.5),
         |u AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
         |reach(id, r) AS (
         |  SELECT src, src FROM u
         |  UNION
         |  SELECT u.src, reach.r FROM u JOIN reach ON u.dst = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |sz AS (SELECT component, count(*) AS csize FROM comp GROUP BY component)
         |SELECT comp.id, comp.component, sz.csize FROM comp JOIN sz USING (component)""".stripMargin,

    // the scale-path twin of d7: edges from the bucketed LSH plan must
    // equal exact all-pairs trigram Jaccard >= 0.9 (the d2b equivalence),
    // and the distributed min-label fixed point must equal the recursive
    // reachability closure — one hash proves the whole composition
    "d7b_components_over_lsh" ->
      s"""WITH RECURSIVE all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
         |t AS (SELECT doc_id, $tokSplit AS toks FROM all_docs),
         |s AS (SELECT doc_id, $trigramSetSql AS sh FROM t),
         |e AS (SELECT id_a AS src, id_b AS dst FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
         |      THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         |      ELSE 0.0 END AS jaccard
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
         |  WHERE jaccard >= 0.9),
         |u AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
         |reach(id, r) AS (
         |  SELECT src, src FROM u
         |  UNION
         |  SELECT u.src, reach.r FROM u JOIN reach ON u.dst = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |sz AS (SELECT component, count(*) AS csize FROM comp GROUP BY component)
         |SELECT comp.id, comp.component, sz.csize FROM comp JOIN sz USING (component)""".stripMargin,

    "d5_embedding_neardup" ->
      s"""SELECT id_a, id_b, cosine FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${cosSql("a.embedding", "b.embedding")} AS cosine
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |WHERE cosine >= 0.3 ORDER BY id_a, id_b""".stripMargin,

    // exact all-pairs over the planted fixture: equality with the Spark
    // side's LSH-bucketed plan proves 100% candidate recall at the 0.99
    // near-dup threshold (background pairs top out at cosine ~0.51)
    "d5b_embedding_neardup_lsh" ->
      s"""WITH fx AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_concat([CAST(embedding[1] * CAST(1.001 AS FLOAT) AS FLOAT)],
         |      embedding[2:64])
         |  FROM embeddings WHERE vec_id < 50)
         |SELECT id_a, id_b, cosine FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${cosSql("a.embedding", "b.embedding")} AS cosine
         |  FROM fx a JOIN fx b ON a.vec_id < b.vec_id)
         |WHERE cosine >= 0.99 ORDER BY id_a, id_b""".stripMargin,

    // SemDeDup proof: the drop set replayed as exact all-pairs cosine
    // >= 0.99 over the same planted fixture — equality shows the engine's
    // cluster-local verify recovers every qualifying pair (co-clustering
    // recall 100%) and drops exactly the larger id of each.
    // COUPLING NOTE: this pin holds because every cos >= 0.99 pair
    // CO-CLUSTERS under the current geometry (nClusters/iterations/init
    // and the fixture's wide margins — near-dup pairs are essentially
    // colinear). A future geometry change can break the hash WITHOUT
    // SemDeDup being wrong in the paper's sense; diagnose such a break as
    // a recall question (which pair stopped co-clustering), not a
    // correctness bug. PropertySpec pins the geometry-free invariants
    // (soundness: every drop has a qualifying pair; single-cluster
    // completeness). Same note applies to d8b and nd3.
    "d8_semdedup" ->
      s"""WITH fx AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_concat([CAST(embedding[1] * CAST(1.001 AS FLOAT) AS FLOAT)],
         |      embedding[2:64])
         |  FROM embeddings WHERE vec_id < 50),
         |p AS (SELECT b.vec_id AS id FROM fx a JOIN fx b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.99)
         |SELECT vec_id AS id, vec_id IN (SELECT id FROM p) AS dropped
         |FROM fx ORDER BY id""".stripMargin,

    // d8 auto geometry + hierarchical assignment — same exact all-pairs
    // pin: green iff routing via coarse groups still co-clusters every
    // cos >= 0.99 pair (the recall question the two-level route raises)
    "d8c_semdedup_hier" ->
      s"""WITH fx AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_concat([CAST(embedding[1] * CAST(1.001 AS FLOAT) AS FLOAT)],
         |      embedding[2:64])
         |  FROM embeddings WHERE vec_id < 50),
         |p AS (SELECT b.vec_id AS id FROM fx a JOIN fx b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.99)
         |SELECT vec_id AS id, vec_id IN (SELECT id FROM p) AS dropped
         |FROM fx ORDER BY id""".stripMargin,

    // d8 under the AUTO cluster geometry — same exact all-pairs pin (the
    // drop set is geometry-independent as long as recall stays 100%), so
    // a green row proves autoClusters keeps co-clustering recall intact
    "d8b_semdedup_auto" ->
      s"""WITH fx AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_concat([CAST(embedding[1] * CAST(1.001 AS FLOAT) AS FLOAT)],
         |      embedding[2:64])
         |  FROM embeddings WHERE vec_id < 50),
         |p AS (SELECT b.vec_id AS id FROM fx a JOIN fx b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.99)
         |SELECT vec_id AS id, vec_id IN (SELECT id FROM p) AS dropped
         |FROM fx ORDER BY id""".stripMargin,

    // closed-form invariant for the adversarial skew-guard fixture (see
    // Queries.d6SkewGuard): the 5000-variant template family is synthetic
    // and SF-independent, pairwise trigram Jaccard 58/60 >= 0.9, so greedy
    // keep-first must collapse it to doc 0 — every other id dropped — and
    // the hot-bucket guard must have engaged (buckets of ~4.4k > cap 1000)
    "d6_skew_guard" ->
      """SELECT CAST(r AS BIGINT) AS id, r <> 0 AS dropped,
        |  TRUE AS guard_engaged
        |FROM range(5000) t(r) ORDER BY id""".stripMargin,

    // end-to-end twin of plans.CorpusPipeline.run (gates -> exact dedup ->
    // MinHash-LSH near-dedup) built from already-proven fragments: quality/
    // n_tokens (t2/t5), language argmax (t3), md5 fingerprint min-id dedup
    // (t4/d1), exact all-pairs trigram Jaccard >= 0.9 with the same greedy
    // keep-first drop policy (d2b). Equality proves the WHOLE composition —
    // the bucketed near-dedup inside the pipeline recovers exactly the
    // exact-Jaccard pair set on the gated, deduped corpus.
    "cp1_corpus_pipeline" ->
      s"""WITH sc AS (SELECT doc_id, text,
         |    $qualitySql AS quality,
         |    $nTokensSql AS n_tokens,
         |  $langScoreCols
         |  FROM documents),
         |meta AS (SELECT doc_id, text, quality, n_tokens,
         |    $langPredSql AS lang
         |  FROM sc),
         |gated AS (SELECT * FROM meta
         |  WHERE n_tokens BETWEEN 5 AND 100000 AND quality >= 0.3),
         |fp AS (SELECT doc_id, text, quality, n_tokens, lang,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
         |  FROM gated),
         |exact AS (SELECT * FROM fp
         |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
         |sh AS (SELECT doc_id, $trigramSetSql AS sh
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM exact)),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
         |      THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         |      ELSE 0.0 END AS j
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT doc_id, lang, n_tokens, quality FROM exact
         |WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs WHERE j >= 0.9)
         |ORDER BY doc_id""".stripMargin,

    // cp7: gates + the t9 Flesch gate -> d1 min-id dedup -> threshold-1.0
    // near-dedup, replayed WITHOUT a pair join (jaccard = 1 on non-empty
    // sets <=> set equality <=> equal canonicalized set hashes; keep-first
    // over an identical-set family keeps exactly the min id, guard or no
    // guard) -> sp5's systematic token-mass sample over the survivors
    "cp7_sampled_pipeline" ->
      s"""WITH sc AS (SELECT doc_id, text,
         |    $qualitySql AS quality,
         |    $nTokensSql AS n_tokens,
         |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
         |      AS n_sents,
         |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
         |      AS n_sylls,
         |  $langScoreCols
         |  FROM documents),
         |fl AS (SELECT *, CASE WHEN n_tokens > 0 THEN
         |      floor((206.835
         |        - 1.015 * (CAST(n_tokens AS DOUBLE) / CAST(n_sents AS DOUBLE))
         |        - 84.6 * (CAST(n_sylls AS DOUBLE) / CAST(n_tokens AS DOUBLE)))
         |        * 1e6 + 0.5) / 1e6
         |    END AS flesch FROM sc),
         |meta AS (SELECT doc_id, text, quality, n_tokens, flesch,
         |    $langPredSql AS lang
         |  FROM fl),
         |gated AS (SELECT * FROM meta
         |  WHERE n_tokens BETWEEN 5 AND 100000 AND quality >= 0.3
         |    AND flesch >= 10.0),
         |fp AS (SELECT doc_id, text, quality, n_tokens, lang,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
         |  FROM gated),
         |exact AS (SELECT * FROM fp
         |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
         |shh AS (SELECT doc_id,
         |    md5(array_to_string(list_sort($trigramSetSql), chr(10))) AS shash
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM exact)),
         |nd AS (SELECT e.* FROM exact e JOIN shh USING (doc_id)
         |  WHERE doc_id IN (SELECT min(doc_id) FROM shh GROUP BY shash)),
         |cum AS (SELECT doc_id, lang, n_tokens, quality,
         |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf,
         |    SUM(n_tokens) OVER () AS tot
         |  FROM nd)
         |SELECT doc_id, lang, n_tokens, quality,
         |  CAST(bf // GREATEST(tot // 50, 1) AS BIGINT) AS sample_rank
         |FROM cum
         |WHERE (bf + n_tokens) // GREATEST(tot // 50, 1) >
         |      bf // GREATEST(tot // 50, 1)""".stripMargin,

    // cp1 with the dc1 decontamination stage spliced between the gates and
    // the dedups: bench = the %97 subset of the RAW corpus; any gated doc
    // sharing a distinct word 5-gram with it drops before fingerprinting,
    // so the dedup stages provably saw the decontaminated corpus
    "cp6_decontaminated_pipeline" ->
      s"""WITH sc AS (SELECT doc_id, text,
         |    $qualitySql AS quality,
         |    $nTokensSql AS n_tokens,
         |  $langScoreCols
         |  FROM documents),
         |meta AS (SELECT doc_id, text, quality, n_tokens,
         |    $langPredSql AS lang
         |  FROM sc),
         |gated AS (SELECT * FROM meta
         |  WHERE n_tokens BETWEEN 5 AND 100000 AND quality >= 0.3),
         |bt AS (SELECT $fivegramSetSql AS gs
         |  FROM (SELECT $tokSplit AS toks FROM documents WHERE doc_id % 97 = 0)),
         |bg AS (SELECT DISTINCT unnest(gs) AS ngram FROM bt),
         |ct AS (SELECT doc_id, $fivegramSetSql AS gs
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM gated)),
         |cg AS (SELECT doc_id, unnest(gs) AS ngram FROM ct),
         |contaminated AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (ngram)),
         |decon AS (SELECT * FROM gated
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |fp AS (SELECT doc_id, text, quality, n_tokens, lang,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
         |  FROM decon),
         |exact AS (SELECT * FROM fp
         |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
         |sh AS (SELECT doc_id, $trigramSetSql AS sh
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM exact)),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
         |      THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         |      ELSE 0.0 END AS j
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT doc_id, lang, n_tokens, quality FROM exact
         |WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs WHERE j >= 0.9)
         |ORDER BY doc_id""".stripMargin,

    // the SELECTIVE pipeline replayed stage by stage: gates (t2/t3
    // formulas) -> CCNet terciles trained on the GATED corpus (ccn1
    // machinery, keep ntile <= 2) -> DSIR two-model comparison trained on
    // the TIER-KEPT corpus (ds1 machinery) -> d1 min-id dedup -> exact
    // all-pairs trigram keep-first. One hash proves both the stage
    // results and that each model saw exactly the prior stage's output
    "cp3_selective_pipeline" ->
      s"""WITH sc0 AS (SELECT doc_id, text,
         |    $qualitySql AS quality,
         |    $nTokensSql AS n_tokens,
         |  $langScoreCols
         |  FROM documents),
         |meta AS (SELECT doc_id, text, quality, n_tokens,
         |    $langPredSql AS lang
         |  FROM sc0),
         |gated AS (SELECT * FROM meta
         |  WHERE n_tokens BETWEEN 5 AND 100000 AND quality >= 0.3),
         |t AS (SELECT doc_id, $tokSplit AS toks FROM gated),
         |b AS (SELECT doc_id,
         |        unnest(toks[1:len(toks)-1]) AS w1,
         |        unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
         |      FROM t),
         |c2 AS (SELECT bg, count(*) AS c2 FROM b GROUP BY bg),
         |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY w1),
         |v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM t)),
         |q AS (SELECT b.doc_id,
         |        CAST(floor(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)
         |          * 1000000000.0 + 0.5) AS BIGINT) AS q
         |      FROM b JOIN c2 USING (bg) JOIN c1 USING (w1), v),
         |lmsc AS (SELECT doc_id,
         |    CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000000.0 AS lm_score
         |  FROM q GROUP BY doc_id),
         |tier AS (SELECT doc_id,
         |    ntile(3) OVER (ORDER BY lm_score DESC, doc_id) AS tb FROM lmsc),
         |kept AS (SELECT g.* FROM gated g JOIN tier USING (doc_id) WHERE tb <= 2),
         |kt AS (SELECT doc_id, lang = 'en' AS tgt, $tokSplit AS toks FROM kept),
         |kb AS (SELECT doc_id, tgt,
         |        unnest(toks[1:len(toks)-1]) AS w1,
         |        unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
         |      FROM kt),
         |tc2 AS (SELECT bg, count(*) AS c2 FROM kb WHERE tgt GROUP BY bg),
         |tc1 AS (SELECT w1, count(*) AS c1 FROM kb WHERE tgt GROUP BY w1),
         |tv AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM kt WHERE tgt)),
         |rc2 AS (SELECT bg, count(*) AS c2 FROM kb GROUP BY bg),
         |rc1 AS (SELECT w1, count(*) AS c1 FROM kb GROUP BY w1),
         |rv AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM kt)),
         |dq AS (SELECT kb.doc_id,
         |        CAST(floor(CAST(coalesce(tc2.c2, 0) + 1 AS DOUBLE)
         |          / CAST(coalesce(tc1.c1, 0) + tv.v AS DOUBLE)
         |          * 1000000000.0 + 0.5) AS BIGINT) AS qt,
         |        CAST(floor(CAST(rc2.c2 + 1 AS DOUBLE) / CAST(rc1.c1 + rv.v AS DOUBLE)
         |          * 1000000000.0 + 0.5) AS BIGINT) AS qr
         |      FROM kb LEFT JOIN tc2 USING (bg) LEFT JOIN tc1 USING (w1)
         |        JOIN rc2 USING (bg) JOIN rc1 USING (w1), tv, rv),
         |dsel AS (SELECT doc_id FROM dq GROUP BY doc_id HAVING sum(qt) > sum(qr)),
         |seld AS (SELECT k.* FROM kept k JOIN dsel USING (doc_id)),
         |fp AS (SELECT doc_id, text, quality, n_tokens, lang,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
         |  FROM seld),
         |exact AS (SELECT * FROM fp
         |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
         |sh AS (SELECT doc_id, $trigramSetSql AS sh
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM exact)),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
         |      THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         |      ELSE 0.0 END AS j
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT doc_id, lang, n_tokens, quality FROM exact
         |WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs WHERE j >= 0.9)
         |ORDER BY doc_id""".stripMargin,

    // distinct word 5-gram twin of WordShingles(text, 5): every slice is
    // exactly len(toks)-4 elements (clamped at 0), so list_zip never pads
    "dc1_decontaminate" ->
      s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
         |corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
         |  UNION ALL SELECT doc_id + 2000000, text FROM bench),
         |bt AS (SELECT doc_id AS bench_id, $fivegramSetSql AS gs
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM bench)),
         |bg AS (SELECT bench_id, unnest(gs) AS ngram FROM bt),
         |ct AS (SELECT doc_id, $fivegramSetSql AS gs
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM corpus)),
         |cg AS (SELECT doc_id, unnest(gs) AS ngram FROM ct)
         |SELECT doc_id, count(DISTINCT ngram) AS n_shared_ngrams,
         |  count(DISTINCT bench_id) AS n_bench_docs
         |FROM cg JOIN bg USING (ngram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // dc2's bloom prefilter + exact verify is result-identical to dc1 by
    // construction (FPs are removed by the exact join) — same oracle.
    "dc2_decontaminate_bloom" ->
      s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
         |corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
         |  UNION ALL SELECT doc_id + 2000000, text FROM bench),
         |bt AS (SELECT doc_id AS bench_id, $fivegramSetSql AS gs
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM bench)),
         |bg AS (SELECT bench_id, unnest(gs) AS ngram FROM bt),
         |ct AS (SELECT doc_id, $fivegramSetSql AS gs
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM corpus)),
         |cg AS (SELECT doc_id, unnest(gs) AS ngram FROM ct)
         |SELECT doc_id, count(DISTINCT ngram) AS n_shared_ngrams,
         |  count(DISTINCT bench_id) AS n_bench_docs
         |FROM cg JOIN bg USING (ngram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // first 32 bits of md5(doc_id-as-string) rebuilt digit-by-digit (the
    // d2/d3 hex2u pattern, 8 chars -> fits BIGINT exactly), mod 100
    "sp1_hash_split" -> {
      val hex8 = (0 until 8).map { j =>
        s"(strpos('0123456789abcdef', substr(h,${j + 1},1)) - 1) * ${1L << (4 * (7 - j))}"
      }.mkString(" + ")
      s"""WITH b AS (SELECT lang, n_chars,
         |    ($hex8) % 100 AS bucket
         |  FROM (SELECT lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
         |        FROM documents))
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM b GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
    },

    // md5 hex strings order identically in both engines (lowercase, binary
    // collation); quota is pure integer math, so the selected id set is
    // bit-identical
    "sp2_stratified_sample" ->
      """WITH r AS (SELECT lang, doc_id,
        |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |rk AS (SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT)
        |      AS sample_rank,
        |    count(*) OVER (PARTITION BY lang) AS n FROM r)
        |SELECT lang, doc_id, sample_rank FROM rk
        |WHERE sample_rank <= (n + 9) // 10
        |ORDER BY lang, sample_rank""".stripMargin,

    // T div n + indicator(rank <= T mod n) replicated per stratum: per-lang
    // copy totals hit max-stratum-size exactly; rank = sp2's md5 rank.
    "mix1_balance_upsample" ->
      """WITH r AS (SELECT lang, doc_id,
        |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |rk AS (SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rnk,
        |    count(*) OVER (PARTITION BY lang) AS n FROM r),
        |t AS (SELECT max(n) AS t
        |  FROM (SELECT count(*) AS n FROM documents GROUP BY lang))
        |SELECT lang, doc_id,
        |  CAST(t // n + CASE WHEN rnk <= t % n THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_copies
        |FROM rk, t ORDER BY lang, doc_id""".stripMargin,

    // The hash-prefix-chunked rank equals a global row_number over the md5
    // order because the chunk key is the hash's own leading byte (fixed
    // -length lowercase hex: lexicographic == numeric-prefix order).
    "sp3_shuffle_order" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (
        |    ORDER BY md5('epoch7:' || CAST(doc_id AS VARCHAR)), doc_id)
        |    AS BIGINT) AS shuffle_rank
        |FROM documents ORDER BY shuffle_rank""".stripMargin,

    // The chunked two-level prefix sum is exactly a plain global running
    // sum; the oracle replays it with one window + floor-div bucketing.
    "sq1_sequence_pack" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok,
        |    COALESCE(SUM(tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before FROM d)
        |SELECT CAST(cum_before // 2048 AS BIGINT) AS seq_id,
        |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS seq_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // planted-PII fixture rebuilt verbatim; patterns interpolated from the
    // SAME Scala vals the Spark query compiles (Java-regex/RE2 common subset)
    "pii1_redact" -> {
      val em = graft.operators.TextPipeline.EmailPattern
      val ph = graft.operators.TextPipeline.PhonePattern
      val ip = graft.operators.TextPipeline.Ipv4Pattern
      s"""WITH p AS (SELECT doc_id, text ||
         |  CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |  CASE WHEN doc_id % 4 = 0 THEN ' call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END ||
         |  CASE WHEN doc_id % 5 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
         |  AS pii FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(pii,
         |    '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g')
         |    AS redacted,
         |  CAST(len(regexp_extract_all(pii, '$em')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(pii, '$ph')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(pii, '$ip')) AS BIGINT) AS n_ips
         |FROM p""".stripMargin
    },

    // fixed 10-token "lines" sliced exactly like TextPipeline.tokenLines;
    // dup = line occurs in >= 2 distinct docs of the planted-dup fixture
    // whole-pipeline twin of cp2: the lr1 rewrite (NATURAL corpus, no
    // planted union), gates recomputed on the rewritten text, md5 min-id
    // dedup — one hash proves the composition end to end
    "cp2_rewrite_pipeline" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
         |l0 AS (SELECT doc_id, unnest(list_transform(range(0, (len(toks)+9)//10),
         |        i -> {'pos': i, 'line': array_to_string(toks[i*10+1:i*10+10], ' ')})) AS u FROM t),
         |l AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM l0),
         |w AS (SELECT doc_id, pos, line,
         |        count(*) OVER (PARTITION BY line) AS n,
         |        row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
         |      FROM l),
         |k AS (SELECT doc_id, pos, line, (n = 1 OR rn = 1) AS keep FROM w),
         |rw AS (SELECT doc_id,
         |        coalesce(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE keep), '') AS text
         |      FROM k GROUP BY doc_id),
         |meta AS (SELECT doc_id, text, $qualitySql AS quality, $nTokensSql AS n_tokens FROM rw),
         |gated AS (SELECT * FROM meta
         |  WHERE n_tokens BETWEEN 5 AND 100000 AND quality >= 0.3),
         |fp AS (SELECT doc_id, quality, n_tokens,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
         |  FROM gated)
         |SELECT doc_id, n_tokens, quality FROM fp
         |WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)
         |ORDER BY doc_id""".stripMargin,

    // whole-pipeline twin of cp2 for the SPAN rewrite: sr1's coverage
    // machinery on the NATURAL corpus (no plants), gates recomputed on
    // the rewritten text, md5 min-id dedup — one hash for the composition
    "cp4_span_rewrite_pipeline" ->
      s"""WITH t AS (SELECT doc_id, $tokSplit AS toks FROM documents),
         |sp0 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 6
         |        THEN list_transform(range(1, len(toks) - 6 + 2),
         |          i -> {'pos': i, 'span': array_to_string(toks[i:i+5], ' ')})
         |        ELSE [] END) AS u FROM t),
         |s2 AS (SELECT doc_id, u.pos AS pos, u.span AS span FROM sp0),
         |w AS (SELECT doc_id, pos,
         |        count(*) OVER (PARTITION BY span) AS n,
         |        row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
         |      FROM s2),
         |rm AS (SELECT DISTINCT doc_id, pos + off AS tpos
         |       FROM w CROSS JOIN range(0, 6) o(off)
         |       WHERE n >= 2 AND rn > 1),
         |tok AS (SELECT doc_id, u.tpos AS tpos, u.tok AS tok FROM
         |        (SELECT doc_id, unnest(list_transform(range(1, len(toks)+1),
         |           i -> {'tpos': i, 'tok': toks[i]})) AS u FROM t)),
         |kept AS (SELECT tok.doc_id, tok.tpos, tok.tok FROM tok
         |         LEFT JOIN rm ON tok.doc_id = rm.doc_id AND tok.tpos = rm.tpos
         |         WHERE rm.doc_id IS NULL),
         |rw AS (SELECT t.doc_id,
         |         coalesce(re.clean_text, '') AS text
         |       FROM t LEFT JOIN (
         |         SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text
         |         FROM kept GROUP BY doc_id) re USING (doc_id)),
         |meta AS (SELECT doc_id, text, $qualitySql AS quality, $nTokensSql AS n_tokens FROM rw),
         |gated AS (SELECT * FROM meta
         |  WHERE n_tokens BETWEEN 5 AND 100000 AND quality >= 0.3),
         |fp AS (SELECT doc_id, quality, n_tokens,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
         |  FROM gated)
         |SELECT doc_id, n_tokens, quality FROM fp
         |WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)
         |ORDER BY doc_id""".stripMargin,

    // the cp5 chain's corpus: config-driven span rewrite + recomputed
    // metadata + dedup stages, survivor set ordered by id
    "cp5_full_pipeline" ->
      (cp5ChainSql +
        "\nSELECT doc_id, lang, n_tokens, quality FROM fin ORDER BY doc_id"),

    // the repeat-cap water-fill (mix4's closed form, HUGEINT-exact) over
    // the cp5 chain's survivor set, stratified by the recomputed lang and
    // sized by the rewritten n_tokens
    "cp5b_pipeline_mixture" ->
      (cp5ChainSql + """,
        |d AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS stratum_size FROM fin GROUP BY lang),
        |w2 AS (SELECT lang, n_docs, stratum_size,
        |    CAST(floor(sqrt(CAST(stratum_size AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS q_weight,
        |    CAST(4 * stratum_size AS BIGINT) AS cap FROM d),
        |tt AS (SELECT CAST(sum(stratum_size) AS BIGINT) AS b FROM w2),
        |s3 AS (SELECT w2.*, tt.b, CAST(cap AS DOUBLE) / CAST(q_weight AS DOUBLE) AS r
        |  FROM w2, tt),
        |o2 AS (SELECT *,
        |    CAST(coalesce(SUM(cap) OVER (ORDER BY r, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c_before,
        |    CAST(SUM(q_weight) OVER (ORDER BY r, lang
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS w_from
        |  FROM s3),
        |bt AS (SELECT *,
        |    (CAST(cap AS HUGEINT) * CAST(w_from AS HUGEINT)
        |      <= (CAST(b AS HUGEINT) - CAST(c_before AS HUGEINT)) * CAST(q_weight AS HUGEINT))
        |      AS ok FROM o2),
        |p2 AS (SELECT *,
        |    CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) OVER (ORDER BY r, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS bad_upto
        |  FROM bt),
        |f2 AS (SELECT *, (ok AND bad_upto = 0) AS capped FROM p2),
        |agg AS (SELECT CAST(coalesce(sum(cap) FILTER (WHERE capped), 0) AS BIGINT) AS ck,
        |    CAST(coalesce(sum(q_weight) FILTER (WHERE NOT capped), 0) AS BIGINT) AS wr FROM f2),
        |sh2 AS (SELECT f2.*, agg.ck, agg.wr,
        |    CASE WHEN f2.capped THEN CAST(f2.cap AS HUGEINT)
        |      ELSE (CAST(f2.b AS HUGEINT) - CAST(agg.ck AS HUGEINT))
        |        * CAST(f2.q_weight AS HUGEINT) // CAST(agg.wr AS HUGEINT) END AS base,
        |    CASE WHEN f2.capped THEN CAST(0 AS HUGEINT)
        |      ELSE (CAST(f2.b AS HUGEINT) - CAST(agg.ck AS HUGEINT))
        |        * CAST(f2.q_weight AS HUGEINT) % CAST(agg.wr AS HUGEINT) END AS remv
        |  FROM f2, agg),
        |lt AS (SELECT CAST(max(b) AS HUGEINT) - max(ck)
        |    - CAST(coalesce(sum(base) FILTER (WHERE NOT capped), 0) AS HUGEINT) AS leftv
        |  FROM sh2),
        |rk AS (SELECT *, CASE WHEN capped THEN NULL
        |    ELSE row_number() OVER (PARTITION BY capped ORDER BY remv DESC, lang) END AS rnk
        |  FROM sh2)
        |SELECT lang, n_docs, stratum_size, q_weight, cap, capped,
        |  CAST(base + CASE WHEN NOT capped AND rnk <= (SELECT leftv FROM lt)
        |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM rk ORDER BY lang""".stripMargin),

    // duplicate-line rewrite: the window pair (count, row_number) replays
    // the engine's (count, min(doc,pos)) aggregate — keep iff unique or
    // canonical first occurrence; planted copies must reassemble to ''
    "lr1_dedup_rewrite" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM all_docs),
        |l0 AS (SELECT doc_id, unnest(list_transform(range(0, (len(toks)+9)//10),
        |        i -> {'pos': i, 'line': array_to_string(toks[i*10+1:i*10+10], ' ')})) AS u FROM t),
        |l AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM l0),
        |w AS (SELECT doc_id, pos, line,
        |        count(*) OVER (PARTITION BY line) AS n,
        |        row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        |      FROM l),
        |k AS (SELECT doc_id, pos, line, (n = 1 OR rn = 1) AS keep FROM w)
        |SELECT doc_id,
        |  coalesce(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE keep), '') AS clean_text,
        |  count(*) AS n_lines,
        |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Gopher heuristic gates: every ratio one exact-integer IEEE division
    // ('...' counted by length-difference div 3 — no regex backslashes);
    // gates compare the UNROUNDED quotients on both sides; planted
    // '#'-spam (ids +5M) must fail the symbol gate
    "t8_gopher_gates" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 5000000, text || ' ' || repeat('# ', 19) || '#'
         |  FROM documents WHERE doc_id < 40),
         |t AS (SELECT doc_id, text, $tokSplit AS toks FROM all_docs),
         |m AS (SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    CAST(len(array_to_string(toks, '')) AS BIGINT) AS n_chars,
         |    CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
         |      + CAST((len(text) - len(replace(text, '...', ''))) // 3 AS BIGINT) AS n_symbols,
         |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
         |    CAST(list_contains(toks, 'the') AS BIGINT) + CAST(list_contains(toks, 'be') AS BIGINT)
         |      + CAST(list_contains(toks, 'to') AS BIGINT) + CAST(list_contains(toks, 'of') AS BIGINT)
         |      + CAST(list_contains(toks, 'and') AS BIGINT) + CAST(list_contains(toks, 'that') AS BIGINT)
         |      + CAST(list_contains(toks, 'have') AS BIGINT) + CAST(list_contains(toks, 'with') AS BIGINT)
         |      AS n_stopwords
         |  FROM t)
         |SELECT doc_id, n_words,
         |  round(CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
         |  round(CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS symbol_ratio,
         |  round(CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS alpha_frac,
         |  n_stopwords,
         |  (CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) BETWEEN 3.0 AND 10.0
         |   AND CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.1
         |   AND CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.8
         |   AND n_stopwords >= 1) AS keep
         |FROM m ORDER BY doc_id""".stripMargin,

    // duplicated-span REWRITE: the lr1 window pair (count, row_number)
    // replays the engine's (count, min(doc,pos)) canonical-owner aggregate
    // over OVERLAPPING spans; coverage = cross join with the 0..k-1 offset
    // range replays the engine's per-occurrence position explode; a token
    // survives iff no non-canonical duplicated window covers it
    "sr1_span_rewrite" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 50
        |  UNION ALL SELECT doc_id + 4000000,
        |    array_to_string(string_split_regex(trim(text), '\s+')[1:12], ' ')
        |      || ' uqa' || CAST(doc_id AS VARCHAR) || ' uqb' || CAST(doc_id AS VARCHAR)
        |      || ' uqc' || CAST(doc_id AS VARCHAR) || ' uqd' || CAST(doc_id AS VARCHAR)
        |      || ' uqe' || CAST(doc_id AS VARCHAR) || ' uqf' || CAST(doc_id AS VARCHAR)
        |  FROM documents
        |  WHERE doc_id < 60 AND len(string_split_regex(trim(text), '\s+')) >= 20),
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM all_docs),
        |sp0 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 6
        |        THEN list_transform(range(1, len(toks) - 6 + 2),
        |          i -> {'pos': i, 'span': array_to_string(toks[i:i+5], ' ')})
        |        ELSE [] END) AS u FROM t),
        |s2 AS (SELECT doc_id, u.pos AS pos, u.span AS span FROM sp0),
        |w AS (SELECT doc_id, pos,
        |        count(*) OVER (PARTITION BY span) AS n,
        |        row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
        |      FROM s2),
        |rm AS (SELECT DISTINCT doc_id, pos + off AS tpos
        |       FROM w CROSS JOIN range(0, 6) o(off)
        |       WHERE n >= 2 AND rn > 1),
        |tok AS (SELECT doc_id, u.tpos AS tpos, u.tok AS tok FROM
        |        (SELECT doc_id, unnest(list_transform(range(1, len(toks)+1),
        |           i -> {'tpos': i, 'tok': toks[i]})) AS u FROM t)),
        |kept AS (SELECT tok.doc_id, tok.tpos, tok.tok FROM tok
        |         LEFT JOIN rm ON tok.doc_id = rm.doc_id AND tok.tpos = rm.tpos
        |         WHERE rm.doc_id IS NULL),
        |re AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
        |              count(*) AS nkept
        |       FROM kept GROUP BY doc_id)
        |SELECT t.doc_id,
        |  coalesce(re.clean_text, '') AS clean_text,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(toks) - coalesce(re.nkept, 0) AS BIGINT) AS n_removed
        |FROM t LEFT JOIN re USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // overlapping k-token spans, duplicated = total multiplicity >= 2
    // (within-doc repeats count, unlike ld1's cross-doc line sharing);
    // integer counts + one exact IEEE division keep the hash portable
    "sd1_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sp AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 6
        |         THEN list_transform(range(1, len(toks) - 6 + 2),
        |                i -> array_to_string(toks[i:i+5], ' '))
        |         ELSE [] END) AS span FROM t),
        |f AS (SELECT span, count(*) AS n_occ FROM sp GROUP BY span),
        |d AS (SELECT sp.doc_id, count(*) AS n_spans,
        |        CAST(sum(CASE WHEN f.n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
        |      FROM sp JOIN f USING (span) GROUP BY sp.doc_id)
        |SELECT doc_id, n_spans, n_dup_spans,
        |  round(CAST(n_dup_spans AS DOUBLE)/CAST(n_spans AS DOUBLE), 6) AS dup_span_frac
        |FROM d ORDER BY doc_id""".stripMargin,

    "ld1_dup_lines" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM all_docs),
        |l AS (SELECT doc_id, unnest(list_transform(range(0, (len(toks)+9)//10),
        |        i -> array_to_string(toks[i*10+1:i*10+10], ' '))) AS line FROM t),
        |f AS (SELECT line, count(DISTINCT doc_id) AS ndocs FROM l GROUP BY line),
        |d AS (SELECT l.doc_id, count(*) AS n_lines,
        |        sum(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END) AS n_dup
        |      FROM l JOIN f USING (line) GROUP BY l.doc_id),
        |m AS (SELECT doc_id, n_lines,
        |        round(CAST(n_dup AS DOUBLE)/CAST(n_lines AS DOUBLE), 6) AS dup_line_frac
        |      FROM d)
        |SELECT doc_id, n_lines, dup_line_frac,
        |  dup_line_frac > 0.3 AS line_dup_flag FROM m""".stripMargin,

    // Moore-Lewis selection: TWO lm1-style Laplace models (target = en
    // docs, raw = whole corpus) over ONE bigram stream; unseen target
    // bigrams/heads coalesce to 0; the flag compares exact integer sums —
    // no floating point reaches the output at all
    "ds1_dsir_select" ->
      """WITH t AS (SELECT doc_id, lang = 'en' AS tgt,
        |        string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id, tgt,
        |        unnest(toks[1:len(toks)-1]) AS w1,
        |        unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
        |      FROM t),
        |tc2 AS (SELECT bg, count(*) AS c2 FROM b WHERE tgt GROUP BY bg),
        |tc1 AS (SELECT w1, count(*) AS c1 FROM b WHERE tgt GROUP BY w1),
        |tv AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM t WHERE tgt)),
        |rc2 AS (SELECT bg, count(*) AS c2 FROM b GROUP BY bg),
        |rc1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY w1),
        |rv AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM t)),
        |q AS (SELECT b.doc_id,
        |        CAST(floor(CAST(coalesce(tc2.c2, 0) + 1 AS DOUBLE)
        |          / CAST(coalesce(tc1.c1, 0) + tv.v AS DOUBLE)
        |          * 1000000000.0 + 0.5) AS BIGINT) AS qt,
        |        CAST(floor(CAST(rc2.c2 + 1 AS DOUBLE) / CAST(rc1.c1 + rv.v AS DOUBLE)
        |          * 1000000000.0 + 0.5) AS BIGINT) AS qr
        |      FROM b LEFT JOIN tc2 USING (bg) LEFT JOIN tc1 USING (w1)
        |        JOIN rc2 USING (bg) JOIN rc1 USING (w1), tv, rv)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(qt) AS BIGINT) AS q_target, CAST(sum(qr) AS BIGINT) AS q_raw,
        |  sum(qt) > sum(qr) AS selected
        |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // parallel unnest zips (w1, "w1 w2") exactly like the Spark arrays_zip;
    // each p is ONE exact-integer IEEE division, the mean is an exact long
    // sum of floor(p*1e9+0.5) — bit-portable without log arithmetic
    "lm1_bigram_score" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id,
        |        unnest(toks[1:len(toks)-1]) AS w1,
        |        unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
        |      FROM t),
        |c2 AS (SELECT bg, count(*) AS c2 FROM b GROUP BY bg),
        |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY w1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM t)),
        |q AS (SELECT b.doc_id,
        |        CAST(floor(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)
        |          * 1000000000.0 + 0.5) AS BIGINT) AS q
        |      FROM b JOIN c2 USING (bg) JOIN c1 USING (w1), v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000000.0 AS lm_score
        |FROM q GROUP BY doc_id""".stripMargin,

    // 64-token windows every 48 tokens; md5 over the space-joined slice —
    // list slicing clamps at the tail in both engines
    "ch1_chunks" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
        |             len(string_split_regex(trim(text), '\s+')) AS n FROM documents)
        |SELECT doc_id,
        |  CAST(unnest(range(0, (n+47)//48)) AS BIGINT) AS chunk_idx,
        |  CAST(unnest(list_transform(range(0, (n+47)//48), k -> least(64, n - k*48)))
        |    AS BIGINT) AS n_chunk_tokens,
        |  unnest(list_transform(range(0, (n+47)//48),
        |    k -> md5(array_to_string(toks[k*48+1:k*48+64], ' ')))) AS chunk_fp
        |FROM t""".stripMargin,

    // fingerprint = t4's hash-green md5 twin; the planted resubmissions'
    // fps exist in the index, so every one must vanish through the anti-join
    "nd1_incremental_dedup" ->
      """WITH fp AS (SELECT doc_id,
        |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp FROM documents),
        |existing AS (SELECT fp FROM fp WHERE doc_id % 10 <> 0),
        |batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % 10 = 0
        |  UNION ALL SELECT doc_id + 3000000, fp FROM fp WHERE doc_id % 10 <> 0 AND doc_id < 30)
        |SELECT min(doc_id) AS doc_id, fp FROM batch
        |WHERE fp NOT IN (SELECT fp FROM existing)
        |GROUP BY fp""".stripMargin,

    // exact replay of incremental NEAR-dedup survival: a batch doc is
    // dropped iff exact trigram jaccard >= 0.9 with any indexed doc, or
    // with a smaller-id batch doc (greedy keep-first). Equality with the
    // engine's guarded index-probe plan proves full candidate recall.
    "nd2_incremental_neardup" ->
      s"""WITH existing AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
         |batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 3000000, text || ' ' || text FROM existing
         |  WHERE doc_id < 60 AND len(string_split_regex(trim(text), '\\s+')) >= 30),
         |es AS (SELECT doc_id, $trigramSetSql AS sh
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM existing)),
         |bs AS (SELECT doc_id, $trigramSetSql AS sh
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM batch)),
         |dropx AS (SELECT DISTINCT b.doc_id FROM bs b JOIN es e ON
         |  CASE WHEN len(b.sh) + len(e.sh) - len(list_intersect(b.sh, e.sh)) > 0
         |    THEN CAST(len(list_intersect(b.sh, e.sh)) AS DOUBLE)
         |         / (len(b.sh) + len(e.sh) - len(list_intersect(b.sh, e.sh)))
         |    ELSE 0.0 END >= 0.9),
         |dropb AS (SELECT DISTINCT b2.doc_id FROM bs b1 JOIN bs b2 ON
         |  b1.doc_id < b2.doc_id AND
         |  CASE WHEN len(b1.sh) + len(b2.sh) - len(list_intersect(b1.sh, b2.sh)) > 0
         |    THEN CAST(len(list_intersect(b1.sh, b2.sh)) AS DOUBLE)
         |         / (len(b1.sh) + len(b2.sh) - len(list_intersect(b1.sh, b2.sh)))
         |    ELSE 0.0 END >= 0.9)
         |SELECT doc_id FROM batch
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropx)
         |  AND doc_id NOT IN (SELECT doc_id FROM dropb)
         |ORDER BY doc_id""".stripMargin,

    // nd5: incremental fuzzy-dedup survival replayed with brute-force
    // levenshtein over both relations (batch x index, batch x batch
    // keep-first) — equality proves the hashed deletion-variant blocking
    // recovers every qualifying match
    "nd5_incremental_fuzzy" ->
      """WITH names AS (SELECT c_custkey AS rec_id,
        |    c_name || '/' || CAST(c_custkey AS VARCHAR)
        |           || '/' || CAST(c_custkey AS VARCHAR) AS name
        |  FROM customer),
        |ex AS (SELECT * FROM names WHERE rec_id % 10 <> 0),
        |b0 AS (SELECT * FROM names WHERE rec_id % 10 = 0),
        |batch AS (
        |  SELECT rec_id, name FROM b0
        |  UNION ALL
        |  SELECT rec_id + 1000000, substr(name, 1, 1) || substr(name, 3)
        |  FROM ex WHERE rec_id < 100
        |  UNION ALL
        |  SELECT rec_id + 2000000, substr(name, 1, 2) || 'x' || substr(name, 4)
        |  FROM b0 WHERE rec_id < 120),
        |dropx AS (SELECT DISTINCT b.rec_id FROM batch b JOIN ex i
        |  ON levenshtein(b.name, i.name) <= 1),
        |dropb AS (SELECT DISTINCT b2.rec_id FROM batch b1 JOIN batch b2
        |  ON b1.rec_id < b2.rec_id AND levenshtein(b1.name, b2.name) <= 1)
        |SELECT rec_id FROM batch
        |WHERE rec_id NOT IN (SELECT rec_id FROM dropx)
        |  AND rec_id NOT IN (SELECT rec_id FROM dropb)
        |ORDER BY rec_id""".stripMargin,

    // incremental SEMANTIC dedup survival replayed as exact all-pairs
    // cosine over both relations (batch x index, batch x batch keep-first)
    // — equality proves nearest-centroid assignment + cluster-local verify
    // recovers every qualifying pair (same demanding pin as d8: holds
    // because cos >= 0.99 pairs co-assign under the current geometry)
    "nd3_incremental_semdedup" ->
      s"""WITH existing AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
         |b0 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
         |batch AS (
         |  SELECT vec_id, embedding FROM b0
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_concat([CAST(embedding[1] * CAST(1.001 AS FLOAT) AS FLOAT)],
         |      embedding[2:64])
         |  FROM existing WHERE vec_id < 50
         |  UNION ALL
         |  SELECT vec_id + 2000000,
         |    list_concat([CAST(embedding[1] * CAST(1.001 AS FLOAT) AS FLOAT)],
         |      embedding[2:64])
         |  FROM b0 WHERE vec_id < 60),
         |dropx AS (SELECT DISTINCT b.vec_id FROM batch b JOIN existing e
         |  ON b.vec_id <> e.vec_id
         |  AND ${cosSql("b.embedding", "e.embedding")} >= 0.99),
         |dropb AS (SELECT DISTINCT b2.vec_id FROM batch b1 JOIN batch b2
         |  ON b1.vec_id < b2.vec_id
         |  AND ${cosSql("b1.embedding", "b2.embedding")} >= 0.99)
         |SELECT vec_id FROM batch
         |WHERE vec_id NOT IN (SELECT vec_id FROM dropx)
         |  AND vec_id NOT IN (SELECT vec_id FROM dropb)
         |ORDER BY vec_id""".stripMargin,

    // nd4: the full SemIndex lifecycle (build -> append blob -> compact ->
    // probe) pinned to the d8-style exact all-pairs replay — green iff the
    // compacted (split) geometry loses no planted-near-copy recall. The
    // blob jitter is keyed by the ORIGINAL id (1 + 0.0001*vec_id in DOUBLE,
    // result cast FLOAT) so both engines derive bit-identical vectors.
    "nd4_compacted_semdedup" ->
      s"""WITH existing AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
         |anchor AS (SELECT embedding AS a FROM embeddings WHERE vec_id = 1),
         |blob AS (
         |  SELECT vec_id + 3000000 AS vec_id,
         |    list_concat([CAST(CAST(a[1] AS DOUBLE) *
         |      (CAST(1.0 AS DOUBLE) + CAST(0.0001 AS DOUBLE) * CAST(vec_id AS DOUBLE)) AS FLOAT)],
         |      a[2:64]) AS embedding
         |  FROM existing, anchor WHERE vec_id % 2 = 0),
         |idx AS (SELECT * FROM existing UNION ALL SELECT * FROM blob),
         |b0 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
         |batch AS (
         |  SELECT vec_id, embedding FROM b0
         |  UNION ALL
         |  SELECT vec_id + 5000000,
         |    list_concat([CAST(embedding[1] * CAST(1.001 AS FLOAT) AS FLOAT)],
         |      embedding[2:64])
         |  FROM existing WHERE vec_id < 50
         |  UNION ALL
         |  SELECT vec_id + 3000000,
         |    list_concat([CAST(embedding[1] * CAST(1.001 AS FLOAT) AS FLOAT)],
         |      embedding[2:64])
         |  FROM blob WHERE vec_id < 3000100),
         |dropx AS (SELECT DISTINCT b.vec_id FROM batch b JOIN idx e
         |  ON b.vec_id <> e.vec_id
         |  AND ${cosSql("b.embedding", "e.embedding")} >= 0.99),
         |dropb AS (SELECT DISTINCT b2.vec_id FROM batch b1 JOIN batch b2
         |  ON b1.vec_id < b2.vec_id
         |  AND ${cosSql("b1.embedding", "b2.embedding")} >= 0.99)
         |SELECT vec_id FROM batch
         |WHERE vec_id NOT IN (SELECT vec_id FROM dropx)
         |  AND vec_id NOT IN (SELECT vec_id FROM dropb)
         |ORDER BY vec_id""".stripMargin,

    // planted-URL fixture; domain = first capture of the shared host
    // pattern, '' -> NULL for no-URL docs (kept by the blocklist filter)
    "url1_domain_filter" -> {
      val pat = graft.operators.TextPipeline.UrlHostPattern
      s"""WITH p AS (SELECT doc_id, text ||
         |  CASE WHEN doc_id % 2 = 0 THEN ' http://site' || CAST(doc_id % 13 AS VARCHAR)
         |       || '.example.com/p/' || CAST(doc_id AS VARCHAR) ELSE '' END AS text
         |  FROM documents),
         |d AS (SELECT doc_id, nullif(regexp_extract(text, '$pat', 1), '') AS domain FROM p)
         |SELECT doc_id, domain FROM d
         |WHERE domain IS NULL OR domain NOT IN ('site0.example.com', 'site7.example.com')""".stripMargin
    },

    // url2/url3: the messy-URL fixture restated verbatim, then the
    // canonicalization replayed step-for-step with DuckDB's regex/list
    // twins of the Spark expressions (same RE2-safe shared patterns)
    "url2_canonicalize" -> {
      val pat = graft.operators.TextPipeline.UrlPartsPattern
      val trk = graft.operators.TextPipeline.TrackingParamPattern
      s"""WITH p AS (SELECT doc_id,
         |  'HTTP://Site' || CAST((doc_id // 2) % 13 AS VARCHAR) || '.Example.COM' ||
         |  CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END ||
         |  '/Art/' || CAST(doc_id // 2 AS VARCHAR) ||
         |  CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=feed&a=1#top'
         |       ELSE '?a=1&utm_campaign=z&b=2' END AS url
         |  FROM documents),
         |x AS (SELECT doc_id, url,
         |  lower(regexp_extract(url, '$pat', 1)) AS scheme,
         |  lower(regexp_extract(url, '$pat', 2)) AS auth,
         |  regexp_extract(url, '$pat', 3) AS path0,
         |  regexp_extract(url, '$pat', 4) AS q0 FROM p),
         |n AS (SELECT doc_id, url, scheme,
         |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$$', '')
         |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
         |       ELSE auth END AS host,
         |  CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
         |  array_to_string(list_sort(list_filter(string_split(q0, '&'),
         |    t -> t <> '' AND NOT regexp_matches(t, '$trk'))), '&') AS qs
         |  FROM x)
         |SELECT doc_id, url,
         |  CASE WHEN scheme = '' THEN url
         |       ELSE scheme || '://' || host || path ||
         |            CASE WHEN qs = '' THEN '' ELSE '?' || qs END END AS canonical_url
         |FROM n ORDER BY doc_id""".stripMargin
    },

    "url3_canonical_dedup" -> {
      val pat = graft.operators.TextPipeline.UrlPartsPattern
      val trk = graft.operators.TextPipeline.TrackingParamPattern
      s"""WITH p AS (SELECT doc_id,
         |  'HTTP://Site' || CAST((doc_id // 2) % 13 AS VARCHAR) || '.Example.COM' ||
         |  CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END ||
         |  '/Art/' || CAST(doc_id // 2 AS VARCHAR) ||
         |  CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=feed&a=1#top'
         |       ELSE '?a=1&utm_campaign=z&b=2' END AS url
         |  FROM documents),
         |x AS (SELECT doc_id, url,
         |  lower(regexp_extract(url, '$pat', 1)) AS scheme,
         |  lower(regexp_extract(url, '$pat', 2)) AS auth,
         |  regexp_extract(url, '$pat', 3) AS path0,
         |  regexp_extract(url, '$pat', 4) AS q0 FROM p),
         |n AS (SELECT doc_id, url, scheme,
         |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$$', '')
         |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
         |       ELSE auth END AS host,
         |  CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
         |  array_to_string(list_sort(list_filter(string_split(q0, '&'),
         |    t -> t <> '' AND NOT regexp_matches(t, '$trk'))), '&') AS qs
         |  FROM x),
         |canon AS (SELECT doc_id,
         |  CASE WHEN scheme = '' THEN url
         |       ELSE scheme || '://' || host || path ||
         |            CASE WHEN qs = '' THEN '' ELSE '?' || qs END END AS canonical_url
         |  FROM n)
         |SELECT min(doc_id) AS doc_id, canonical_url, count(*) AS n_dups
         |FROM canon GROUP BY canonical_url ORDER BY doc_id""".stripMargin
    },

    // ks1: drift1's binned counts extended with exact-integer cumulative
    // sums; each CDF is one IEEE division, the gap one subtraction — no
    // quantization needed (see Drift.ksDrift scaladoc)
    "ks1_drift" ->
      """WITH a AS (SELECT LEAST(GREATEST(CAST(floor((o_totalprice - 0.0) / 25000.0) AS BIGINT), 0), 19) AS bin
        |           FROM orders WHERE o_totalprice IS NOT NULL
        |             AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        |     b AS (SELECT LEAST(GREATEST(CAST(floor((o_totalprice - 0.0) / 25000.0) AS BIGINT), 0), 19) AS bin
        |           FROM orders WHERE o_totalprice IS NOT NULL
        |             AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
        |     ac AS (SELECT bin, count(*) AS cnt_a FROM a GROUP BY bin),
        |     bc AS (SELECT bin, count(*) AS cnt_b FROM b GROUP BY bin),
        |     bins AS (SELECT unnest(generate_series(0, 19)) AS bin),
        |     f AS (SELECT bins.bin, CAST(COALESCE(ac.cnt_a, 0) AS BIGINT) AS cnt_a,
        |                  CAST(COALESCE(bc.cnt_b, 0) AS BIGINT) AS cnt_b
        |           FROM bins LEFT JOIN ac ON bins.bin = ac.bin
        |                     LEFT JOIN bc ON bins.bin = bc.bin),
        |     t AS (SELECT SUM(cnt_a) AS ta, SUM(cnt_b) AS tb FROM f),
        |     cum AS (SELECT bin, cnt_a, cnt_b,
        |             SUM(cnt_a) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS ca,
        |             SUM(cnt_b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cb
        |             FROM f),
        |     sh AS (SELECT c.bin, c.cnt_a, c.cnt_b,
        |            CASE WHEN t.ta > 0 THEN CAST(c.ca AS DOUBLE) / t.ta ELSE 0.0 END AS cdf_a,
        |            CASE WHEN t.tb > 0 THEN CAST(c.cb AS DOUBLE) / t.tb ELSE 0.0 END AS cdf_b
        |            FROM cum c CROSS JOIN t)
        |SELECT bin, cnt_a, cnt_b, cdf_a, cdf_b, abs(cdf_a - cdf_b) AS gap
        |FROM sh ORDER BY bin""".stripMargin,

    // assoc1/assoc1b: the chi-square grid replayed with HUGEINT exact
    // numerators/denominators (the Spark side's DECIMAL(38,0)), one
    // double cast each, identical IEEE finish, 6dp quantization
    "assoc1_chi2" ->
      """WITH cells AS (SELECT CAST(o_orderpriority AS VARCHAR) AS val_a,
        |    CAST(o_orderstatus AS VARCHAR) AS val_b, count(*) AS obs
        |  FROM orders WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT val_a, CAST(SUM(obs) AS BIGINT) AS row_tot FROM cells GROUP BY 1),
        |ct AS (SELECT val_b, CAST(SUM(obs) AS BIGINT) AS col_tot FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
        |f AS (SELECT rt.val_a, ct.val_b, CAST(COALESCE(c.obs, 0) AS BIGINT) AS obs,
        |    rt.row_tot, ct.col_tot, tt.n
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN cells c ON rt.val_a = c.val_a AND ct.val_b = c.val_b
        |  CROSS JOIN tt),
        |m AS (SELECT val_a, val_b, obs,
        |    CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE) AS exp_raw,
        |    CAST(CAST(n AS HUGEINT) * obs - CAST(row_tot AS HUGEINT) * col_tot AS DOUBLE) AS num_d,
        |    CAST(CAST(n AS HUGEINT) * row_tot * col_tot AS DOUBLE) AS den_d
        |  FROM f)
        |SELECT val_a, val_b, obs,
        |  floor(exp_raw * 1e6 + 0.5) / 1e6 AS expected,
        |  floor(num_d * num_d / den_d * 1e6 + 0.5) / 1e6 AS contrib
        |FROM m ORDER BY val_a, val_b""".stripMargin,

    "assoc1b_cramers" ->
      """WITH cells AS (SELECT CAST(o_orderpriority AS VARCHAR) AS val_a,
        |    CAST(o_orderstatus AS VARCHAR) AS val_b, count(*) AS obs
        |  FROM orders WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT val_a, CAST(SUM(obs) AS BIGINT) AS row_tot FROM cells GROUP BY 1),
        |ct AS (SELECT val_b, CAST(SUM(obs) AS BIGINT) AS col_tot FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
        |f AS (SELECT rt.val_a, ct.val_b, CAST(COALESCE(c.obs, 0) AS BIGINT) AS obs,
        |    rt.row_tot, ct.col_tot, tt.n
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN cells c ON rt.val_a = c.val_a AND ct.val_b = c.val_b
        |  CROSS JOIN tt),
        |m AS (SELECT val_a, val_b, obs,
        |    CAST(CAST(n AS HUGEINT) * obs - CAST(row_tot AS HUGEINT) * col_tot AS DOUBLE) AS num_d,
        |    CAST(CAST(n AS HUGEINT) * row_tot * col_tot AS DOUBLE) AS den_d
        |  FROM f),
        |g AS (SELECT CAST(SUM(obs) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT val_a) AS BIGINT) AS r,
        |    CAST(COUNT(DISTINCT val_b) AS BIGINT) AS c,
        |    SUM(CAST(floor(num_d * num_d / den_d * 1e6 + 0.5) AS HUGEINT)) AS chi2i
        |  FROM m)
        |SELECT n_rows, (r - 1) * (c - 1) AS dof,
        |  CAST(chi2i AS DOUBLE) / 1e6 AS chi2,
        |  CASE WHEN (r - 1) * (c - 1) > 0
        |    THEN floor(sqrt((CAST(chi2i AS DOUBLE) / 1e6) /
        |         (CAST(n_rows AS DOUBLE) * LEAST(r - 1, c - 1))) * 1e6 + 0.5) / 1e6
        |    ELSE 0.0 END AS cramers_v
        |FROM g""".stripMargin,

    // ts1: step = second-truncated epoch floored to the day; last-in-step
    // by (sec, event_id) DESC mirrors Spark's max(struct) tie-break; the
    // per-key grid + IGNORE NULLS running last replays the forward fill
    "ts1_resample" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |s AS (SELECT user_id, event_id, value, sec,
        |    (sec // 86400) * 86400 AS step FROM e),
        |obs AS (SELECT user_id, step, value FROM (
        |    SELECT user_id, step, value,
        |      row_number() OVER (PARTITION BY user_id, step
        |        ORDER BY sec DESC, event_id DESC) AS rn
        |    FROM s) WHERE rn = 1),
        |span AS (SELECT user_id, min(step) AS lo, max(step) AS hi
        |         FROM s GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, 86400)) AS step
        |         FROM span),
        |j AS (SELECT g.user_id, g.step, o.value AS obs_value
        |      FROM grid g LEFT JOIN obs o
        |        ON g.user_id = o.user_id AND g.step = o.step)
        |SELECT user_id, make_timestamp(step * 1000000) AS step_start,
        |  last_value(obs_value IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY step ROWS UNBOUNDED PRECEDING) AS value,
        |  obs_value IS NOT NULL AS observed
        |FROM j""".stripMargin,

    // an1: trailing 20-row window stats from exact integer sums (BIGINT /
    // HUGEINT — frame evaluation order cannot matter), one IEEE z finish
    // in Spark's exact operation order, 6dp quantization
    "an1_rolling_anomaly" ->
      """WITH e AS (SELECT event_id, user_id, ts, value,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS q FROM events),
        |w AS (SELECT event_id, user_id, q,
        |    COUNT(*) OVER win AS n,
        |    SUM(q) OVER win AS sm,
        |    CAST(SUM(CAST(q AS HUGEINT) * q) OVER win AS DOUBLE) AS ss
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |m AS (SELECT event_id, user_id, n,
        |    CAST(n AS DOUBLE) AS nd, CAST(sm AS DOUBLE) AS sd,
        |    CAST(q AS DOUBLE) AS qd, ss,
        |    CAST(n AS DOUBLE) * ss - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) AS varnum
        |  FROM w),
        |z AS (SELECT event_id, user_id,
        |    CASE WHEN n >= 2 AND varnum > 0
        |      THEN floor((qd * nd - sd) /
        |             (nd * sqrt(varnum / (nd * (nd - 1.0)))) * 1e6 + 0.5) / 1e6
        |      ELSE 0.0 END AS z
        |  FROM m)
        |SELECT event_id, user_id, z, abs(z) > 3.0 AS is_anomaly FROM z""".stripMargin,

    // reg1: five HUGEINT-exact sufficient sums per group (the Spark
    // side's DECIMAL(38,0)), closed-form OLS finish in the identical
    // IEEE op order, 6dp quantization
    "reg1_groupwise_trend" ->
      """WITH o AS (SELECT o_orderpriority,
        |    CAST(floor(CAST(floor(epoch(o_orderdate)) AS BIGINT) / 86400.0) AS BIGINT) AS x_day,
        |    CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT) AS qy
        |  FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
        |g AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x_day AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x_day AS HUGEINT) * x_day) AS DOUBLE) AS sxx,
        |    CAST(SUM(qy) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x_day AS HUGEINT) * qy) AS DOUBLE) AS sxy,
        |    CAST(SUM(qy * qy) AS DOUBLE) AS syy
        |  FROM o GROUP BY 1),
        |m AS (SELECT o_orderpriority, n, CAST(n AS DOUBLE) AS nd, sx, sy,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS den,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS deny,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num
        |  FROM g)
        |SELECT o_orderpriority, n AS n_rows,
        |  CASE WHEN n >= 2 AND den > 0
        |    THEN floor((num / den / 1e6) * 1e6 + 0.5) / 1e6 ELSE 0.0 END AS slope,
        |  CASE WHEN n >= 2 AND den > 0
        |    THEN floor(((sy / 1e6 - (num / den / 1e6) * sx) / nd) * 1e6 + 0.5) / 1e6
        |    ELSE 0.0 END AS intercept,
        |  CASE WHEN n >= 2 AND den > 0 AND deny > 0
        |    THEN floor((num * num / (den * deny)) * 1e6 + 0.5) / 1e6
        |    ELSE 0.0 END AS r2
        |FROM m ORDER BY o_orderpriority""".stripMargin,

    // te1: smoothed target encoding replayed with HUGEINT-exact category
    // sums; the global mean and the shrink are the identical IEEE
    // sequence, 6dp quantization
    "te1_target_encode" ->
      """WITH s AS (SELECT o_orderpriority,
        |    SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT)) AS qs,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |g AS (SELECT SUM(qs) AS gqs, SUM(n) AS gn FROM s),
        |e AS (SELECT s.o_orderpriority,
        |    floor(((CAST(s.qs AS DOUBLE) / 1e6 + 10.0 *
        |      ((CAST(g.gqs AS DOUBLE) / 1e6) / CAST(g.gn AS DOUBLE))) /
        |      (CAST(s.n AS DOUBLE) + 10.0)) * 1e6 + 0.5) / 1e6 AS o_orderpriority_te
        |  FROM s CROSS JOIN g)
        |SELECT o.o_orderkey, o.o_orderpriority, e.o_orderpriority_te
        |FROM orders o JOIN e USING (o_orderpriority)""".stripMargin,

    // fe1: quantile_cont fences (bit-compatible with the Spark helper —
    // see exactQuantilesDistributed's scaladoc), map-only comparison sum
    "fe1_quantile_bin" ->
      """WITH f AS (SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
        |    quantile_cont(l_extendedprice, 0.5) AS q2,
        |    quantile_cont(l_extendedprice, 0.75) AS q3 FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  CASE WHEN l_extendedprice IS NULL THEN NULL ELSE
        |    CAST(l_extendedprice > f.q1 AS BIGINT) +
        |    CAST(l_extendedprice > f.q2 AS BIGINT) +
        |    CAST(l_extendedprice > f.q3 AS BIGINT) END AS l_extendedprice_bin
        |FROM lineitem CROSS JOIN f""".stripMargin,

    // sc1: exact min/max broadcast, identical IEEE scale expression
    "sc1_minmax_scale" ->
      """WITH s AS (SELECT min(l_quantity) AS mn1, max(l_quantity) AS mx1,
        |    min(l_tax) AS mn2, max(l_tax) AS mx2 FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_quantity, l_tax,
        |  CASE WHEN l_quantity IS NULL THEN NULL
        |       WHEN mx1 - mn1 > 0
        |         THEN floor((l_quantity - mn1) / (mx1 - mn1) * 1e6 + 0.5) / 1e6
        |       ELSE 0.0 END AS l_quantity_scaled,
        |  CASE WHEN l_tax IS NULL THEN NULL
        |       WHEN mx2 - mn2 > 0
        |         THEN floor((l_tax - mn2) / (mx2 - mn2) * 1e6 + 0.5) / 1e6
        |       ELSE 0.0 END AS l_tax_scaled
        |FROM lineitem CROSS JOIN s""".stripMargin,

    // tm1: key-local lag -> pair counts -> row-normalized shares; one
    // IEEE division per pair on exact counts
    "tm1_transitions" ->
      """WITH p AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS frm
        |  FROM events),
        |c AS (SELECT frm AS from_state, event_type AS to_state,
        |    CAST(count(*) AS BIGINT) AS n_trans
        |  FROM p WHERE frm IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_state, SUM(n_trans) AS tot FROM c GROUP BY 1)
        |SELECT c.from_state, c.to_state, c.n_trans,
        |  CAST(c.n_trans AS DOUBLE) / t.tot AS p
        |FROM c JOIN t USING (from_state)
        |ORDER BY from_state, to_state""".stripMargin,

    // pr1: all 5 integer-PageRank hops unrolled — BIGINT mass, floor
    // division per edge, one double damping multiply per node per hop in
    // Spark's exact op order; ranks are bit-equal by construction
    "pr1_pagerank" -> {
      def hop(prev: String, out: String): String =
        s"""$out AS (SELECT nodes.node,
           |  CAST(floor((1.0 - 0.85) * 1000000000000.0 / par.n) AS BIGINT)
           |  + CAST(floor(0.85 * CAST(COALESCE(sm.m, 0) AS DOUBLE)) AS BIGINT) AS rank
           |  FROM nodes CROSS JOIN par LEFT JOIN (
           |    SELECT e.dst, SUM(r.rank // d.outdeg) AS m
           |    FROM edges e JOIN $prev r ON e.src = r.node
           |    JOIN deg d ON e.src = d.src
           |    GROUP BY e.dst) sm ON nodes.node = sm.dst)""".stripMargin
      s"""WITH edges AS (
         |  SELECT DISTINCT l_suppkey AS src, l_partkey + 2000000000 AS dst FROM lineitem
         |  UNION
         |  SELECT DISTINCT l_partkey + 2000000000 AS src, l_suppkey AS dst FROM lineitem),
         |nodes AS (SELECT DISTINCT src AS node FROM edges
         |          UNION SELECT DISTINCT dst AS node FROM edges),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
         |par AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |r0 AS (SELECT node, CAST(floor(1000000000000.0 / par.n) AS BIGINT) AS rank
         |       FROM nodes CROSS JOIN par),
         |${hop("r0", "i1")},
         |${hop("i1", "i2")},
         |${hop("i2", "i3")},
         |${hop("i3", "i4")},
         |${hop("i4", "i5")}
         |SELECT node, rank FROM i5 ORDER BY node""".stripMargin
    },

    // tc1: DuckDB counts the same triangles with plain id-order canonical
    // edges (a < b < c) — degree orientation changes WHERE each triangle
    // is found, never the triangle set, so per-node counts are identical
    "tc1_triangle_count" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS a, b.pk AS b
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |n AS (SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM n GROUP BY node ORDER BY node""".stripMargin,

    // tc2: tc1's triangle CTE plus per-node degrees; the coefficient is
    // one IEEE division of exact BIGINT products, 6dp-quantized
    "tc2_clustering_coeff" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS a, b.pk AS b
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        |  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY node),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |n AS (SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
        |tcnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM n GROUP BY node)
        |SELECT deg.node, deg.degree,
        |  COALESCE(tcnt.n_triangles, 0) AS n_triangles,
        |  CASE WHEN deg.degree >= 2
        |    THEN floor(CAST(2 * COALESCE(tcnt.n_triangles, 0) AS DOUBLE) /
        |      CAST(deg.degree * (deg.degree - 1) AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    ELSE 0.0 END AS clustering_coeff
        |FROM deg LEFT JOIN tcnt USING (node)""".stripMargin,

    // gini1 / gini1b: HUGEINT-exact branch sizes and Σc² (the Spark
    // side's DECIMAL(38,0)), one double cast per side, the fixed
    // (share · gini) IEEE sequence, 6dp quantization; the split impurity
    // is the exact integer sum of quantized branch terms
    "gini1_split_branches" ->
      """WITH c AS (SELECT CAST(o_orderpriority AS VARCHAR) AS val,
        |    CAST(o_orderstatus AS VARCHAR) AS target,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        |  GROUP BY 1, 2),
        |v AS (SELECT val, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    SUM(CAST(cnt AS HUGEINT) * cnt) AS sumsq FROM c GROUP BY val),
        |t AS (SELECT SUM(n_rows) AS n FROM v),
        |m AS (SELECT val, n_rows,
        |    CAST(CAST(n_rows AS HUGEINT) * n_rows - sumsq AS DOUBLE) /
        |      CAST(CAST(n_rows AS HUGEINT) * n_rows AS DOUBLE) AS gini_raw,
        |    CAST(n_rows AS DOUBLE) / CAST(n AS DOUBLE) AS sh
        |  FROM v CROSS JOIN t)
        |SELECT val, n_rows, floor(gini_raw * 1e6 + 0.5) / 1e6 AS gini,
        |  floor(sh * gini_raw * 1e6 + 0.5) / 1e6 AS weighted
        |FROM m ORDER BY val""".stripMargin,

    "gini1b_split_stat" ->
      """WITH c AS (SELECT CAST(o_orderpriority AS VARCHAR) AS val,
        |    CAST(o_orderstatus AS VARCHAR) AS target,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        |  GROUP BY 1, 2),
        |v AS (SELECT val, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    SUM(CAST(cnt AS HUGEINT) * cnt) AS sumsq FROM c GROUP BY val),
        |t AS (SELECT SUM(n_rows) AS n FROM v),
        |m AS (SELECT n_rows,
        |    CAST(CAST(n_rows AS HUGEINT) * n_rows - sumsq AS DOUBLE) /
        |      CAST(CAST(n_rows AS HUGEINT) * n_rows AS DOUBLE) AS gini_raw,
        |    CAST(n_rows AS DOUBLE) / CAST(n AS DOUBLE) AS sh
        |  FROM v CROSS JOIN t),
        |s6 AS (SELECT SUM(CAST(floor(sh * gini_raw * 1e6 + 0.5) AS HUGEINT)) AS s
        |  FROM m),
        |cls AS (SELECT target, CAST(SUM(cnt) AS BIGINT) AS cnt
        |  FROM c GROUP BY target),
        |root AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |    SUM(CAST(cnt AS HUGEINT) * cnt) AS sumsq FROM cls),
        |fin AS (SELECT root.n,
        |    floor(CAST(CAST(root.n AS HUGEINT) * root.n - root.sumsq AS DOUBLE) /
        |      CAST(CAST(root.n AS HUGEINT) * root.n AS DOUBLE) * 1e6 + 0.5) / 1e6
        |      AS root_gini,
        |    CAST(s6.s AS DOUBLE) / 1e6 AS split_impurity
        |  FROM root CROSS JOIN s6)
        |SELECT n AS n_rows, root_gini, split_impurity,
        |  floor((root_gini - split_impurity) * 1e6 + 0.5) / 1e6 AS gini_gain
        |FROM fin""".stripMargin,

    // gini2: per-feature union blocks melt identically to the Spark
    // explode; each feature's n / root gini cover its own non-null
    // subset; same HUGEINT-exact products and quantized-weighted-sum
    // conventions as gini1/gini1b
    "gini2_feature_ranking" ->
      """WITH m AS (
        |  SELECT 'o_orderpriority' AS feature,
        |      CAST(o_orderpriority AS VARCHAR) AS val,
        |      CAST(o_orderstatus AS VARCHAR) AS target
        |    FROM orders
        |    WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        |  UNION ALL
        |  SELECT 'order_year', CAST(year(o_orderdate) AS VARCHAR),
        |      CAST(o_orderstatus AS VARCHAR)
        |    FROM orders
        |    WHERE o_orderstatus IS NOT NULL AND o_orderdate IS NOT NULL
        |  UNION ALL
        |  SELECT 'price_bucket',
        |      CAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS VARCHAR),
        |      CAST(o_orderstatus AS VARCHAR)
        |    FROM orders
        |    WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL),
        |c AS (SELECT feature, val, target, CAST(count(*) AS BIGINT) AS cnt
        |  FROM m GROUP BY 1, 2, 3),
        |v AS (SELECT feature, val, CAST(SUM(cnt) AS BIGINT) AS n_v,
        |    SUM(CAST(cnt AS HUGEINT) * cnt) AS sumsq FROM c GROUP BY 1, 2),
        |nf AS (SELECT feature, CAST(SUM(n_v) AS BIGINT) AS n FROM v GROUP BY 1),
        |w AS (SELECT v.feature,
        |    SUM(CAST(floor(CAST(v.n_v AS DOUBLE) / CAST(nf.n AS DOUBLE) *
        |      (CAST(CAST(v.n_v AS HUGEINT) * v.n_v - v.sumsq AS DOUBLE) /
        |       CAST(CAST(v.n_v AS HUGEINT) * v.n_v AS DOUBLE))
        |      * 1e6 + 0.5) AS HUGEINT)) AS s6
        |  FROM v JOIN nf USING (feature) GROUP BY 1),
        |r AS (SELECT feature, CAST(SUM(c2) AS BIGINT) AS n_rows,
        |    SUM(CAST(c2 AS HUGEINT) * c2) AS rss
        |  FROM (SELECT feature, target, SUM(cnt) AS c2 FROM c GROUP BY 1, 2)
        |  GROUP BY 1),
        |fin AS (SELECT r.feature, r.n_rows,
        |    floor(CAST(CAST(r.n_rows AS HUGEINT) * r.n_rows - r.rss AS DOUBLE) /
        |      CAST(CAST(r.n_rows AS HUGEINT) * r.n_rows AS DOUBLE) * 1e6 + 0.5) / 1e6
        |      AS root_gini,
        |    CAST(w.s6 AS DOUBLE) / 1e6 AS split_impurity
        |  FROM r JOIN w USING (feature))
        |SELECT feature, n_rows, root_gini, split_impurity,
        |  floor((root_gini - split_impurity) * 1e6 + 0.5) / 1e6 AS gini_gain
        |FROM fin ORDER BY gini_gain DESC, feature""".stripMargin,

    // sc2: quantile_cont fences (the fe1 bit-compatibility contract),
    // identical IEEE scale chain, 6dp quantize; zero-IQR pins 0
    "sc2_robust_scale" -> {
      def sc(c: String) =
        s"""CASE WHEN $c IS NULL THEN NULL
           |     WHEN f.${c}_q3 - f.${c}_q1 > 0
           |       THEN floor(($c - f.${c}_med) / (f.${c}_q3 - f.${c}_q1)
           |            * 1e6 + 0.5) / 1e6
           |     ELSE 0.0 END AS ${c}_rscaled""".stripMargin
      s"""WITH f AS (SELECT
         |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS l_quantity_q1,
         |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS l_quantity_med,
         |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS l_quantity_q3,
         |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS l_extendedprice_q1,
         |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS l_extendedprice_med,
         |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS l_extendedprice_q3
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         |  ${sc("l_quantity")},
         |  ${sc("l_extendedprice")}
         |FROM lineitem CROSS JOIN f""".stripMargin
    },

    // w7: cumulative distinct = running sum of first-seen counts (never a
    // growing distinct state); lag window over the bounded day frame
    "w7_user_growth" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) AS BIGINT) AS day
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM e GROUP BY day),
        |fs AS (SELECT user_id, MIN(day) AS day FROM e GROUP BY user_id),
        |np AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
        |  FROM fs GROUP BY day),
        |j AS (SELECT dau.day, dau.dau, COALESCE(np.new_users, 0) AS new_users
        |  FROM dau LEFT JOIN np USING (day))
        |SELECT day, dau, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM j ORDER BY day""".stripMargin,

    // churn1: per-user last-day aggregate, end-day censoring, cumulative
    // deaths over the bounded day frame, one IEEE hazard division
    "churn1_hazard" -> {
      val hex8 = (0 until 8).map { j =>
        s"(strpos('0123456789abcdef', substr(h,${j + 1},1)) - 1) * ${1L << (4 * (7 - j))}"
      }.mkString(" + ")
      s"""WITH kept AS (SELECT user_id, ts FROM (
        |    SELECT user_id, ts, md5(CAST(event_id AS VARCHAR)) AS h
        |    FROM events) WHERE ($hex8) % 20 = 0),
        |e AS (SELECT user_id,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) AS BIGINT) AS day
        |  FROM kept WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |l AS (SELECT user_id, MAX(day) AS last FROM e GROUP BY user_id),
        |h AS (SELECT MAX(last) AS endd, CAST(count(*) AS BIGINT) AS n_users
        |  FROM l),
        |d AS (SELECT last AS day, CAST(count(*) AS BIGINT) AS n_events
        |  FROM l CROSS JOIN h WHERE last < endd GROUP BY last),
        |f AS (SELECT d.day, d.n_events, h.n_users,
        |    COALESCE(SUM(d.n_events) OVER (ORDER BY d.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM d CROSS JOIN h)
        |SELECT day, CAST(n_users - prior AS BIGINT) AS n_at_risk, n_events,
        |  floor(CAST(n_events AS DOUBLE) / CAST(n_users - prior AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS hazard
        |FROM f ORDER BY day""".stripMargin
    },

    // w6: distinct (user, day) first, then the classic day − row_number
    // island id — pure integer output
    "w6_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) AS BIGINT) AS day
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |i AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        |  FROM d),
        |r AS (SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_days,
        |  CAST(count(*) AS BIGINT) AS n_streaks,
        |  MAX(len) AS longest_streak
        |FROM r GROUP BY user_id""".stripMargin,

    // fe2: verbatim lag carries plus the an1-style exact-integer window
    // sum; one IEEE division chain per row, 6dp quantization
    "fe2_rolling_features" ->
      """WITH f AS (SELECT event_id, user_id, value,
        |    lag(value, 1) OVER w AS value_lag1,
        |    lag(value, 2) OVER w AS value_lag2,
        |    SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s,
        |    COUNT(value) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS c
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, value, value_lag1, value_lag2,
        |  CASE WHEN c > 0
        |    THEN floor(CAST(s AS DOUBLE) / CAST(c AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6
        |  END AS value_rmean3
        |FROM f""".stripMargin,

    // ar1: exact-count replay of the Apriori-pruned pair rules; lift's
    // numerator/denominator products are exact HUGEINT (the Spark side's
    // DECIMAL(38,0)) with one double cast each, 6dp quantization
    "ar1_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT o.o_custkey AS bk, p.p_brand AS it
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey),
        |ic AS (SELECT it, CAST(count(*) AS BIGINT) AS n_item
        |  FROM bi GROUP BY it),
        |fi AS (SELECT * FROM ic WHERE n_item >= 5),
        |pr AS (SELECT bi.bk, bi.it FROM bi JOIN fi USING (it)),
        |pairs AS (SELECT a.it AS item_a, b.it AS item_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM pr a JOIN pr b ON a.bk = b.bk AND a.it < b.it
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_bk FROM bi)
        |SELECT item_a, item_b, n_ab, fa.n_item AS n_a, fb.n_item AS n_b,
        |  floor(CAST(n_ab AS DOUBLE) / CAST(n_bk AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS support,
        |  floor(CAST(n_ab AS DOUBLE) / CAST(fa.n_item AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS conf_a_b,
        |  floor(CAST(n_ab AS DOUBLE) / CAST(fb.n_item AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS conf_b_a,
        |  floor(CAST(CAST(n_ab AS HUGEINT) * n_bk AS DOUBLE) /
        |    CAST(CAST(fa.n_item AS HUGEINT) * fb.n_item AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS lift,
        |  floor(CAST(n_ab AS DOUBLE) /
        |    sqrt(CAST(CAST(fa.n_item AS HUGEINT) * fb.n_item AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |    AS cosine
        |FROM pairs
        |JOIN fi fa ON pairs.item_a = fa.it
        |JOIN fi fb ON pairs.item_b = fb.it
        |CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin,

    // ab1: HUGEINT-exact per-group sufficient sums, the documented IEEE
    // chain — quantized means, raw variances, one t finish, 6dp
    "ab1_welch_t" -> {
      def side(name: String, sfx: String) =
        s"""(SELECT CAST(count(*) AS BIGINT) AS n_$sfx,
           |  floor(CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
           |    / count(*) / 1e6 * 1e6 + 0.5) / 1e6 AS mean_$sfx,
           |  CASE WHEN count(*) >= 2 THEN
           |  (CAST(count(*) AS DOUBLE) *
           |     CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT) *
           |              CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
           |   - CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE) *
           |     CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE))
           |  / (CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) - 1.0)) / 1e12
           |  ELSE 0.0 END AS vraw_$sfx
           | FROM orders
           | WHERE o_totalprice IS NOT NULL AND o_orderpriority = '$name')""".stripMargin
      s"""WITH a AS ${side("1-URGENT", "a")},
         |b AS ${side("5-LOW", "b")},
         |m AS (SELECT * FROM a CROSS JOIN b)
         |SELECT n_a, n_b, mean_a, mean_b,
         |  floor(vraw_a * 1e6 + 0.5) / 1e6 AS var_a,
         |  floor(vraw_b * 1e6 + 0.5) / 1e6 AS var_b,
         |  CASE WHEN n_a >= 2 AND n_b >= 2 AND (vraw_a > 0 OR vraw_b > 0)
         |    THEN floor((mean_a - mean_b) /
         |      sqrt(vraw_a / CAST(n_a AS DOUBLE) + vraw_b / CAST(n_b AS DOUBLE))
         |      * 1e6 + 0.5) / 1e6
         |    ELSE 0.0 END AS t_stat
         |FROM m""".stripMargin
    },

    // drift4: the driftColSql pattern keyed by segment — zero-filled over
    // (segments observed on either side) x bins, shares normalized WITHIN
    // each segment, same rational divergence chain
    "drift4_by_segment" ->
      """WITH ca AS (SELECT lang AS segment,
        |    LEAST(GREATEST(CAST(floor((n_chars - 0.0) / 50.0) AS BIGINT), 0), 11) AS bin,
        |    count(*) AS cnt_a
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL AND doc_id % 2 = 0
        |  GROUP BY 1, 2),
        |cb AS (SELECT lang AS segment,
        |    LEAST(GREATEST(CAST(floor((n_chars - 0.0) / 50.0) AS BIGINT), 0), 11) AS bin,
        |    count(*) AS cnt_b
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL AND doc_id % 2 <> 0
        |  GROUP BY 1, 2),
        |segs AS (SELECT segment FROM ca UNION SELECT segment FROM cb),
        |bins AS (SELECT CAST(unnest(range(0, 12)) AS BIGINT) AS bin),
        |f AS (SELECT s.segment, b.bin,
        |    CAST(COALESCE(ca.cnt_a, 0) AS BIGINT) AS cnt_a,
        |    CAST(COALESCE(cb.cnt_b, 0) AS BIGINT) AS cnt_b
        |  FROM segs s CROSS JOIN bins b
        |  LEFT JOIN ca ON s.segment = ca.segment AND b.bin = ca.bin
        |  LEFT JOIN cb ON s.segment = cb.segment AND b.bin = cb.bin),
        |t AS (SELECT segment, SUM(cnt_a) AS ta, SUM(cnt_b) AS tb
        |  FROM f GROUP BY 1),
        |sh AS (SELECT f.segment, f.bin, f.cnt_a, f.cnt_b,
        |    CASE WHEN t.ta > 0 THEN CAST(f.cnt_a AS DOUBLE) / t.ta ELSE 0.0 END AS share_a,
        |    CASE WHEN t.tb > 0 THEN CAST(f.cnt_b AS DOUBLE) / t.tb ELSE 0.0 END AS share_b
        |  FROM f JOIN t USING (segment))
        |SELECT segment, bin, cnt_a, cnt_b, share_a, share_b,
        |  CASE WHEN share_a + share_b > 0
        |    THEN (share_a - share_b) * (share_a - share_b) / (share_a + share_b)
        |    ELSE 0.0 END AS divergence
        |FROM sh""".stripMargin,

    // rfm1: exact per-customer aggregates (reg1's epoch-day convention,
    // HUGEINT monetary sum), quantile_cont fences on the aggregated
    // frame (the fe1 bit-compatibility contract), integer comparison
    // scores
    "rfm1_segments" -> {
      def fences(x: String, p: String) =
        s"quantile_cont($x, 0.25) AS ${p}1, quantile_cont($x, 0.5) AS ${p}2, " +
          s"quantile_cont($x, 0.75) AS ${p}3"
      def score(x: String, p: String) =
        s"1 + CAST($x > ${p}1 AS BIGINT) + CAST($x > ${p}2 AS BIGINT) + " +
          s"CAST($x > ${p}3 AS BIGINT)"
      s"""WITH per AS (SELECT o_custkey AS customer,
         |    MAX(CAST(floor(CAST(floor(epoch(o_orderdate)) AS BIGINT) / 86400.0) AS BIGINT)) AS lastd,
         |    CAST(count(*) AS BIGINT) AS frequency,
         |    CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE) / 1e6 AS monetary
         |  FROM orders
         |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
         |    AND o_totalprice IS NOT NULL
         |  GROUP BY 1),
         |mx AS (SELECT MAX(lastd) AS maxd FROM per),
         |rfm AS (SELECT customer, maxd - lastd AS recency, frequency, monetary
         |  FROM per CROSS JOIN mx),
         |f AS (SELECT ${fences("CAST(recency AS DOUBLE)", "r")},
         |    ${fences("CAST(frequency AS DOUBLE)", "fq")},
         |    ${fences("monetary", "m")} FROM rfm),
         |sc AS (SELECT customer, recency, frequency, monetary,
         |    ${score("CAST(recency AS DOUBLE)", "r")} AS r_score,
         |    ${score("CAST(frequency AS DOUBLE)", "fq")} AS f_score,
         |    ${score("monetary", "m")} AS m_score
         |  FROM rfm CROSS JOIN f)
         |SELECT customer, recency, frequency, monetary, r_score, f_score,
         |  m_score,
         |  CAST(r_score AS VARCHAR) || '-' || CAST(f_score AS VARCHAR) ||
         |    '-' || CAST(m_score AS VARCHAR) AS segment
         |FROM sc""".stripMargin
    },

    // pop1: HUGEINT-exact period totals, lag over the bounded period
    // frame, one fixed IEEE percent finish
    "pop1_period_growth" ->
      """WITH per AS (SELECT
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS period,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE) / 1e6 AS total
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |g AS (SELECT period, n_rows, total,
        |    lag(total) OVER (ORDER BY period) AS prev_total FROM per)
        |SELECT period, n_rows, total, prev_total,
        |  CASE WHEN prev_total IS NOT NULL AND prev_total <> 0
        |    THEN floor((total - prev_total) / prev_total * 100 * 1e6 + 0.5) / 1e6
        |  END AS growth_pct
        |FROM g ORDER BY period""".stripMargin,

    // pmi1: multiset bigrams via list_zip (t6's construction WITHOUT
    // list_distinct), exact HUGEINT lift products, one IEEE division
    "pmi1_collocations" ->
      s"""WITH tk AS (SELECT unnest($tokSplit) AS tok FROM documents),
         |tok AS (SELECT tok FROM tk WHERE tok <> ''),
         |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_tok
         |  FROM tok GROUP BY tok),
         |w AS (SELECT CAST(count(*) AS BIGINT) AS w FROM tok),
         |bgl AS (SELECT list_transform(
         |    list_zip(t[1:len(t)-1], t[2:len(t)]),
         |    x -> x[1] || ' ' || x[2]) AS bgs
         |  FROM (SELECT $tokSplit AS t FROM documents)),
         |bg AS (SELECT unnest(bgs) AS bigram FROM bgl),
         |b AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bg),
         |cnt AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n_ab
         |  FROM bg GROUP BY bigram HAVING count(*) >= 3),
         |sp AS (SELECT string_split(bigram, ' ')[1] AS w1,
         |    string_split(bigram, ' ')[2] AS w2, n_ab FROM cnt)
         |SELECT sp.w1, sp.w2, sp.n_ab, ua.n_tok AS n_a, ub.n_tok AS n_b,
         |  floor(CAST(CAST(sp.n_ab AS HUGEINT) * w.w * w.w AS DOUBLE) /
         |    CAST(CAST(b.b AS HUGEINT) * ua.n_tok * ub.n_tok AS DOUBLE) *
         |    1e6 + 0.5) / 1e6 AS pmi_lift
         |FROM sp
         |JOIN uni ua ON sp.w1 = ua.tok
         |JOIN uni ub ON sp.w2 = ub.tok
         |CROSS JOIN w CROSS JOIN b
         |ORDER BY pmi_lift DESC, w1, w2 LIMIT 20""".stripMargin,

    // dv1: the same derived v1/v2 snapshots full-outer-joined with
    // null-safe per-column comparison; concat_ws skips the NULL cases in
    // both engines, so changed_cols strings are identical
    "dv1_table_diff" ->
      """WITH v1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_custkey
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |v2 AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice,
        |    o_custkey
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |j AS (SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
        |    v1.o_orderkey IS NOT NULL AS in_old,
        |    v2.o_orderkey IS NOT NULL AS in_new,
        |    concat_ws(',',
        |      CASE WHEN v1.o_custkey IS DISTINCT FROM v2.o_custkey THEN 'o_custkey' END,
        |      CASE WHEN v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus THEN 'o_orderstatus' END,
        |      CASE WHEN v1.o_totalprice IS DISTINCT FROM v2.o_totalprice THEN 'o_totalprice' END) AS cc
        |  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey),
        |d AS (SELECT o_orderkey,
        |    CASE WHEN NOT in_old THEN 'added' WHEN NOT in_new THEN 'removed'
        |         WHEN cc <> '' THEN 'changed' ELSE 'unchanged' END AS change_type,
        |    cc FROM j)
        |SELECT o_orderkey, change_type,
        |  CASE WHEN change_type = 'changed' THEN cc END AS changed_cols
        |FROM d WHERE change_type <> 'unchanged'""".stripMargin,

    // sp4: sp1's md5-bucket arithmetic applied to the GROUP key — split
    // is a pure function of l_orderkey, so group atomicity is by
    // construction; HUGEINT-exact per-group price sums
    "sp4_group_split" -> {
      val hex8 = (0 until 8).map { j =>
        s"(strpos('0123456789abcdef', substr(h,${j + 1},1)) - 1) * ${1L << (4 * (7 - j))}"
      }.mkString(" + ")
      s"""WITH b AS (SELECT l_orderkey, l_extendedprice,
         |    ($hex8) % 100 AS bucket
         |  FROM (SELECT l_orderkey, l_extendedprice,
         |        md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem))
         |SELECT l_orderkey,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(SUM(CAST(floor(l_extendedprice * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE) / 1e6 AS total_price
         |FROM b GROUP BY 1, 2""".stripMargin
    },

    // ewma1: the 8 trailing lags unrolled with the exact integer weights
    // 3^i * 4^(7-i); numerator/denominator accumulate as BIGINT per row,
    // one IEEE division chain, 6dp quantization — bit-equal by
    // construction
    "ewma1_smoothing" -> {
      val k = 8
      val weights = (0 until k).map(i =>
        (BigInt(3).pow(i) * BigInt(4).pow(k - 1 - i)).toLong)
      val qv = "CAST(floor(value * 1e6 + 0.5) AS BIGINT)"
      val lags = (0 until k).map { i =>
        if (i == 0) s"$qv AS q0" else s"lag($qv, $i) OVER w AS q$i"
      }.mkString(",\n        |    ")
      val num = (0 until k).map(i =>
        s"CASE WHEN q$i IS NOT NULL THEN q$i * ${weights(i)} ELSE 0 END")
        .mkString(" + ")
      val den = (0 until k).map(i =>
        s"CASE WHEN q$i IS NOT NULL THEN ${weights(i)} ELSE 0 END")
        .mkString(" + ")
      s"""WITH q AS (SELECT event_id, user_id, value,
         |    $lags
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT event_id, user_id, value,
         |  CASE WHEN ($den) > 0
         |    THEN floor(CAST(($num) AS DOUBLE) / CAST(($den) AS DOUBLE) /
         |      1e6 * 1e6 + 0.5) / 1e6
         |  END AS ewma
         |FROM q""".stripMargin
    },

    // ij1: sessions (w3 pattern) x SCD2 runs (scd1 pattern) as half-open
    // epoch-second intervals; DuckDB joins them with the plain overlap
    // predicate — proving the bucketed first-shared-bucket emission is
    // exactly the overlap relation, with no duplicates and no misses
    "ij1_interval_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |f AS (SELECT user_id, event_id, ts, sec,
        |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |      THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sid AS (SELECT user_id, sec,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_id FROM f),
        |sess AS (SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |    MIN(sec) AS s_start, MAX(sec) + 1 AS s_end
        |  FROM sid GROUP BY user_id, sess_id),
        |cap AS (SELECT user_id, MAX(sec) + 1 AS cp FROM e GROUP BY 1),
        |flagged AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN row_number() OVER w = 1
        |           OR event_type IS DISTINCT FROM lag(event_type) OVER w
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs0 AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS run FROM flagged),
        |runs AS (
        |  SELECT user_id, CAST(run AS BIGINT) AS run,
        |         MIN(event_type) AS event_type, MIN(ts) AS valid_from
        |  FROM runs0 GROUP BY user_id, run),
        |hist AS (
        |  SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) AS valid_to
        |  FROM runs),
        |rr AS (SELECT h.user_id, h.event_type,
        |    CAST(floor(epoch(h.valid_from)) AS BIGINT) AS r_start,
        |    COALESCE(CAST(floor(epoch(h.valid_to)) AS BIGINT), cap.cp) AS r_end
        |  FROM hist h JOIN cap ON h.user_id = cap.user_id)
        |SELECT s.user_id, s.sess_id, s.s_start, s.s_end, rr.event_type,
        |  rr.r_start, rr.r_end,
        |  LEAST(s.s_end, rr.r_end) - GREATEST(s.s_start, rr.r_start) AS overlap_secs
        |FROM sess s JOIN rr ON s.user_id = rr.user_id
        |  AND s.s_start < rr.r_end AND rr.r_start < s.s_end""".stripMargin,

    // oh1: the pinned category dictionary as indicator CASEs
    "oh1_onehot" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS BIGINT) AS prio_1_urgent,
        |  CAST(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS BIGINT) AS prio_2_high,
        |  CAST(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS BIGINT) AS prio_3_medium,
        |  CAST(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END AS BIGINT) AS prio_4_not_specified,
        |  CAST(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS BIGINT) AS prio_5_low
        |FROM orders""".stripMargin,

    // the per-stratum chunked prefix sum equals a plain per-lang running
    // sum over (md5, doc_id) order — the sp3/sq1 equivalence per stratum
    "mix2_token_budget" ->
      """WITH d AS (SELECT lang, doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    md5('mix2:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |c AS (SELECT lang, doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before FROM d)
        |SELECT lang, doc_id, n_tokens, cum_before FROM c
        |WHERE cum_before < 2000""".stripMargin,

    // whitespace vs BPE counts; the BPE side is the nested-replace replay
    // of the committed merge table per distinct word, joined back
    "tok1_bpe_count" ->
      s"""WITH $bpeCntCtes,
         |d AS (SELECT doc_id, unnest($tokSplit) AS w FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ws_tokens,
         |  CAST(sum(bpe_n) AS BIGINT) AS n_bpe_tokens
         |FROM d JOIN bpec USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // per-(lang, source) tokenizer fertility from the same replay; the
    // fertility is one exact rational division of the two long sums
    "tok2_bpe_fertility" ->
      s"""WITH $bpeCntCtes,
         |d AS (SELECT lang, source, unnest($tokSplit) AS w FROM documents),
         |nd AS (SELECT lang, source, count(*) AS n_docs FROM documents GROUP BY lang, source),
         |tok AS (SELECT lang, source, count(*) AS n_ws_tokens,
         |    CAST(sum(bpe_n) AS BIGINT) AS n_bpe_tokens
         |  FROM d JOIN bpec USING (w) GROUP BY lang, source)
         |SELECT lang, source, n_docs, n_ws_tokens, n_bpe_tokens,
         |  round(CAST(n_bpe_tokens AS DOUBLE)/CAST(n_ws_tokens AS DOUBLE), 6) AS fertility
         |FROM nd JOIN tok USING (lang, source) ORDER BY lang, source""".stripMargin,

    // mix2's per-stratum running-sum selection, denominated in the BPE
    // replay's counts (salt mix2b:, budget 4000)
    "mix2b_token_budget_bpe" ->
      s"""WITH $bpeCntCtes,
         |d AS (SELECT lang, doc_id, unnest($tokSplit) AS w FROM documents),
         |dn AS (SELECT lang, doc_id, CAST(sum(bpe_n) AS BIGINT) AS n_tokens,
         |    md5('mix2b:' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM d JOIN bpec USING (w) GROUP BY lang, doc_id),
         |c AS (SELECT lang, doc_id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS cum_before FROM dn)
         |SELECT lang, doc_id, n_tokens, cum_before FROM c
         |WHERE cum_before < 4000""".stripMargin,

    // sq1's greedy packing, denominated in the BPE replay's counts
    "sq1b_sequence_pack_bpe" ->
      s"""WITH $bpeCntCtes,
         |d AS (SELECT doc_id, unnest($tokSplit) AS w FROM documents),
         |dn AS (SELECT doc_id, CAST(sum(bpe_n) AS BIGINT) AS tok
         |  FROM d JOIN bpec USING (w) GROUP BY doc_id),
         |c AS (SELECT doc_id, tok,
         |    COALESCE(SUM(tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cum_before FROM dn)
         |SELECT CAST(cum_before // 2048 AS BIGINT) AS seq_id,
         |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS seq_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "t7_repetition" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokSplit) AS tk FROM documents),
         |pt AS (SELECT doc_id, tk, count(*) AS cnt FROM tok GROUP BY doc_id, tk),
         |agg AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_toks,
         |    count(*) AS n_distinct, CAST(max(cnt) AS BIGINT) AS top_cnt
         |  FROM pt GROUP BY doc_id),
         |m AS (SELECT doc_id, n_toks,
         |    round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_toks AS DOUBLE), 6)
         |      AS dup_token_ratio,
         |    round(CAST(top_cnt AS DOUBLE) / CAST(n_toks AS DOUBLE), 6)
         |      AS top_token_frac
         |  FROM agg)
         |SELECT doc_id, n_toks, dup_token_ratio, top_token_frac,
         |  (top_token_frac > 0.3 OR dup_token_ratio > 0.5) AS repetitive
         |FROM m""".stripMargin,

    // per-row quality + dup-ratio twins rolled up with the lsum mean
    "cq1_corpus_report" ->
      s"""WITH d AS (SELECT lang, source,
         |    $qualitySql AS q,
         |    round(1.0 - CAST(len(list_distinct($tokSplit)) AS DOUBLE)
         |      / CAST(len($tokSplit) AS DOUBLE), 6) AS dup_ratio
         |  FROM documents)
         |SELECT lang, source, count(*) AS n_docs,
         |  ${lmean("q")} AS avg_quality,
         |  ${lmean("dup_ratio")} AS avg_dup_ratio,
         |  CAST(sum(CASE WHEN q < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_low_quality
         |FROM d GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // learned-gate invariant (the d6/s2 pattern): the in-engine ridge
    // classifier must reproduce the planted "contains 'dup'" labeling
    // exactly — training/scoring regressions flip the hash red
    "qc1_quality_classifier" ->
      """SELECT doc_id,
        |  list_contains(string_split_regex(trim(text), '\s+'), 'dup') AS pred_bad,
        |  list_contains(string_split_regex(trim(text), '\s+'), 'dup') AS label_bad,
        |  TRUE AS correct
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p13_histogram" ->
      """SELECT CAST(CAST(floor(l_extendedprice/5000.0) AS BIGINT)*5000 AS DOUBLE)
        |    AS bin_lo, count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // p15: sparse 2-D bins — quantity width-10, discount 2-cent buckets
    // of the 6dp-quantized cents (integer edges in both engines)
    "p15_histogram2d" ->
      """SELECT CAST(CAST(floor(l_quantity / 10.0) AS BIGINT) * 10 AS DOUBLE)
        |    AS qty_lo,
        |  CAST((CAST(floor(l_discount * 100 + 0.5) AS BIGINT) // 2) * 2 AS DOUBLE)
        |    / 100.0 AS disc_lo,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    // p16: the max(struct) pick = row_number over (cnt DESC, type DESC)
    "p16_group_mode" ->
      """WITH c AS (SELECT user_id, event_type,
        |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, event_type, cnt,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY cnt DESC, event_type DESC) AS rn FROM c)
        |SELECT user_id, event_type AS mode_event, cnt AS n_occurrences
        |FROM r WHERE rn = 1""".stripMargin,

    // p17: key-local rank pick; the even-n finish is one IEEE add +
    // divide on the identical operands — bit-equal without quantization
    "p17_group_median" ->
      """WITH r AS (SELECT o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_custkey) AS n
        |  FROM orders)
        |SELECT o_custkey, CAST(MIN(n) AS BIGINT) AS n_orders,
        |  SUM(o_totalprice) / count(*) AS median_value
        |FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
        |GROUP BY o_custkey""".stripMargin,

    // ch2: the identical RE2 pattern (no lookbehind) runs in DuckDB;
    // aligned unnests replay posexplode, trim-then-filter matches
    "ch2_sentences" ->
      """WITH s AS (SELECT doc_id,
        |    regexp_extract_all(text, '[^.!?]+[.!?]*') AS raw FROM documents),
        |u AS (SELECT doc_id,
        |    CAST(unnest(range(0, len(raw))) AS BIGINT) AS sent_idx,
        |    trim(unnest(raw)) AS sentence
        |  FROM s)
        |SELECT doc_id, sent_idx, sentence,
        |  CAST(len(regexp_extract_all(sentence, '\S+')) AS BIGINT) AS n_tokens
        |FROM u WHERE sentence <> ''""".stripMargin,

    // t9: three regex counts + the fixed IEEE Flesch chain, 6dp quantize
    "t9_readability" ->
      """WITH c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
        |      AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |      AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    floor((206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |      - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
        |      * 1e6 + 0.5) / 1e6
        |  END AS flesch
        |FROM c""".stripMargin,

    // sp5: the chunked prefix decomposition replays as a plain windowed
    // running sum (the sq1 equivalence); stride crossings are pure
    // integer arithmetic
    "sp5_systematic_sample" ->
      """WITH c AS (SELECT doc_id, lang, n_chars,
        |    COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf,
        |    SUM(n_chars) OVER () AS tot
        |  FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  CAST(bf // GREATEST(tot // 100, 1) AS BIGINT) AS sample_rank
        |FROM c
        |WHERE (bf + n_chars) // GREATEST(tot // 100, 1) >
        |      bf // GREATEST(tot // 100, 1)""".stripMargin,

    // prof1: the oracle computes every statistic DIRECTLY from the whole
    // table with the lmean/lstd twins — equality with Spark's merged
    // batch profiles proves incremental profiling is exact
    "prof1_merged_describe" -> {
      val blocks = Queries.CorrCols.map { c =>
        s"""SELECT '$c' AS col_name, count($c) AS n,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  ${lmean(c)} AS mean, ${lstd(c)} AS std,
           |  CAST(min($c) AS DOUBLE) AS min_val,
           |  CAST(max($c) AS DOUBLE) AS max_val
           |FROM lineitem""".stripMargin
      }
      blocks.mkString("\nUNION ALL\n") + "\nORDER BY col_name"
    },

    // p14: the fused one-scan Pearson matrix — integer sums replay in
    // HUGEINT (exact, order-independent like Spark's DECIMAL(38,0)), then
    // the same fixed double formula per pair; 6dp quantized
    "p14_corr_matrix" -> {
      val cols = Queries.CorrCols
      def q(c: String) = s"CAST(floor(($c)*1000000.0 + 0.5) AS HUGEINT)"
      val sums = cols.map(c => s"CAST(SUM(${q(c)}) AS DOUBLE) AS s_$c")
      val prods = for { i <- cols.indices; j <- i until cols.length } yield
        s"CAST(SUM(${q(cols(i))} * ${q(cols(j))}) AS DOUBLE) AS p_${cols(i)}_${cols(j)}"
      def corr(x: String, y: String) = {
        def f(c: String) = s"((n * p_${c}_$c) - (s_$c * s_$c))"
        s"floor((((n * p_${x}_$y) - (s_$x * s_$y)) / (sqrt(${f(x)}) * sqrt(${f(y)}))) " +
          "* 1000000.0 + 0.5) / 1000000.0"
      }
      val rows = for { i <- cols.indices; j <- (i + 1) until cols.length } yield
        s"""SELECT '${cols(i)}' AS col_x, '${cols(j)}' AS col_y,
           |  CAST(n AS BIGINT) AS n_rows, ${corr(cols(i), cols(j))} AS corr FROM a""".stripMargin
      s"""WITH a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  ${(sums ++ prods).mkString(",\n  ")}
         |FROM lineitem)
         |${rows.mkString("\nUNION ALL\n")}
         |ORDER BY col_x, col_y""".stripMargin
    },

    // rational idf (tf*N/df, no log) - every score is one exact-integer
    // IEEE division; (score DESC, term) makes the per-doc top-3 unique
    "tt1_top_terms" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT doc_id, term,
        |    CAST(tf*n AS DOUBLE)/CAST(df AS DOUBLE) AS score
        |  FROM tf JOIN df USING (term), n),
        |r AS (SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        |  FROM sc)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, score FROM r
        |WHERE rnk <= 3""".stripMargin,

    // the sketch gate again: the engine's KLL sketch must rank within the
    // disclosed ±1% envelope; the oracle pins the gates TRUE
    "p12_approx_quantile_gate" ->
      """SELECT CAST(0.5 AS DOUBLE) AS pct, TRUE AS rank_ok
        |UNION ALL SELECT CAST(0.9 AS DOUBLE), TRUE
        |UNION ALL SELECT CAST(0.99 AS DOUBLE), TRUE ORDER BY pct""".stripMargin,

    // the sketch gate: the oracle pins the exact count and expects the
    // engine's HLL estimate to land within the disclosed ±5% envelope
    "p11_approx_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS exact_custkeys,
        |  TRUE AS approx_within_5pct FROM orders""".stripMargin,

    // p11b: the oracle pins every group's gate TRUE beside the exact
    // count — the p11 convention, grouped
    "p11b_group_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_within_5pct
        |FROM events GROUP BY event_type""".stripMargin,

    "s1_knn_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
         |  FROM embeddings WHERE vec_id < 5),
         |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ${cosSql("q.qvec", "e.embedding")} AS cosine
         |  FROM q, embeddings e WHERE q.query_id <> e.vec_id),
         |ranked AS (SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM scored)
         |SELECT query_id, neighbor_id, cosine, rank FROM ranked
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "e3_centroids" ->
      """WITH x AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
        |  unnest(embedding) AS v FROM embeddings)
        |SELECT label, CAST(dim AS BIGINT) AS dim,
        |  CAST(SUM(CAST(floor(CAST(v AS DOUBLE)*1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 1000000000.0 / count(v) AS m
        |FROM x GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    // stub codec contract: dims from payload length by BIGINT arithmetic,
    // content id = first 8 bytes of SHA-256 over the utf-8 payload
    "mm1_image_meta" ->
      """SELECT doc_id AS id, 'image/fake' AS mime,
        |  CAST(256 + (octet_length(encode(text)) * 2654435761) % 1024 AS INTEGER) AS width,
        |  CAST(256 + ((octet_length(encode(text)) * 2654435761) // 1024) % 1024 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  substr(sha256(text), 1, 16) AS sha
        |FROM documents ORDER BY id""".stripMargin,

    // stub frame-sampling contract: nframes = 1 + n_bytes % 8, stride 2,
    // dims the same Knuth-mix arithmetic as mm1 — all BIGINT-exact in SQL
    "mm2_frames" ->
      """WITH m AS (SELECT doc_id AS id, octet_length(encode(text)) AS nb FROM documents),
        |f AS (SELECT id, nb, unnest(range(0, 1 + nb % 8, 2)) AS fi FROM m)
        |SELECT id, CAST(fi AS INTEGER) AS frame_index,
        |  CAST(256 + (nb * 2654435761) % 1024 AS INTEGER) AS width,
        |  CAST(256 + ((nb * 2654435761) // 1024) % 1024 AS INTEGER) AS height,
        |  CAST(nb AS BIGINT) AS n_bytes
        |FROM f ORDER BY id, frame_index""".stripMargin,

    // planted-dup invariant through the multimodal embedding pipeline: the
    // engine must find every (i, i+1e6) identical-payload pair via
    // byte-histogram embedding + blocked LSH near-dup; the oracle asserts
    // the invariant (TRUE for all 50 planted ids)
    "mm3_media_embed" ->
      """SELECT doc_id AS id, TRUE AS dup_found FROM documents
        |WHERE doc_id < 50 ORDER BY id""".stripMargin,

    // ANN gates: the topk entries emit per-query `recall_ok` (approximate
    // top-10 hit-count vs exact brute force >= 6) and `k_full` (a full 10
    // results returned); the oracle asserts the invariant — TRUE for every
    // query id — so a recall regression flips the driver hash red instead
    // of hiding in a rows-only check. The approximate neighbor lists
    // themselves follow the engine-private hash functions and cannot be
    // reproduced by an independent oracle.
    "s2_lsh_topk" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS k_full
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    "s3_ivf_topk" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS k_full
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // two-level IVF probe: same recall-gate contract as s3 (the lists are
    // engine-private; the invariant is the checkable surface)
    "s3b_ivf_topk_hier" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS k_full
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // exact replay of the int8 codes: same max-abs scale, same
    // left-associated floor(v / amax * 127 + 0.5) on the double-widened
    // float — integer outputs, so the compare is exact, not ulp-tolerant
    "qz1_embedding_quantize" ->
      """WITH x AS (SELECT vec_id,
        |    list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS amax,
        |    generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS v
        |  FROM embeddings)
        |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
        |  CASE WHEN amax > 0
        |    THEN CAST(floor(CAST(v AS DOUBLE) / amax * 127.0 + 0.5) AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS q
        |FROM x ORDER BY vec_id, dim""".stripMargin,

    // quantization-recall invariant (the s2/s3 gate pattern)
    "s4_quant_topk" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS k_full
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // α=0.5 temperature mixture: sqrt is IEEE-correctly-rounded (the one
    // portable libm call), then quantized to BIGINT — floor share +
    // largest-remainder top-up are pure integer arithmetic, so the
    // allocation replays exactly and sums to the 100000 budget
    // repeat-cap water-fill: sort by cap/weight, prefix/suffix windows,
    // HUGEINT cross-product cap test, mix3's floor + largest-remainder on
    // the uncapped remainder — budget is the corpus's own token total
    "mix4_repeat_cap" ->
      """WITH d AS (SELECT lang || '/' || source AS stratum,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS stratum_size
        |  FROM documents GROUP BY 1),
        |w AS (SELECT stratum, n_docs, stratum_size,
        |    CAST(floor(sqrt(CAST(stratum_size AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS q_weight,
        |    CAST(2 * stratum_size AS BIGINT) AS cap
        |  FROM d),
        |tt AS (SELECT CAST(sum(stratum_size) AS BIGINT) AS b FROM w),
        |s AS (SELECT w.*, tt.b, CAST(cap AS DOUBLE) / CAST(q_weight AS DOUBLE) AS r
        |  FROM w, tt),
        |o AS (SELECT *,
        |    CAST(coalesce(SUM(cap) OVER (ORDER BY r, stratum
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c_before,
        |    CAST(SUM(q_weight) OVER (ORDER BY r, stratum
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS w_from
        |  FROM s),
        |bt AS (SELECT *,
        |    (CAST(cap AS HUGEINT) * CAST(w_from AS HUGEINT)
        |      <= (CAST(b AS HUGEINT) - CAST(c_before AS HUGEINT)) * CAST(q_weight AS HUGEINT))
        |      AS ok FROM o),
        |p AS (SELECT *,
        |    CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) OVER (ORDER BY r, stratum
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS bad_upto
        |  FROM bt),
        |f AS (SELECT *, (ok AND bad_upto = 0) AS capped FROM p),
        |agg AS (SELECT CAST(coalesce(sum(cap) FILTER (WHERE capped), 0) AS BIGINT) AS ck,
        |    CAST(coalesce(sum(q_weight) FILTER (WHERE NOT capped), 0) AS BIGINT) AS wr FROM f),
        |sh AS (SELECT f.*, agg.ck, agg.wr,
        |    CASE WHEN f.capped THEN CAST(f.cap AS HUGEINT)
        |      ELSE (CAST(f.b AS HUGEINT) - CAST(agg.ck AS HUGEINT))
        |        * CAST(f.q_weight AS HUGEINT) // CAST(agg.wr AS HUGEINT) END AS base,
        |    CASE WHEN f.capped THEN CAST(0 AS HUGEINT)
        |      ELSE (CAST(f.b AS HUGEINT) - CAST(agg.ck AS HUGEINT))
        |        * CAST(f.q_weight AS HUGEINT) % CAST(agg.wr AS HUGEINT) END AS remv
        |  FROM f, agg),
        |lt AS (SELECT CAST(max(b) AS HUGEINT) - max(ck)
        |    - CAST(coalesce(sum(base) FILTER (WHERE NOT capped), 0) AS HUGEINT) AS leftv
        |  FROM sh),
        |rk AS (SELECT *, CASE WHEN capped THEN NULL
        |    ELSE row_number() OVER (PARTITION BY capped ORDER BY remv DESC, stratum) END AS rnk
        |  FROM sh)
        |SELECT stratum, n_docs, stratum_size, q_weight, cap, capped,
        |  CAST(base + CASE WHEN NOT capped AND rnk <= (SELECT leftv FROM lt)
        |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM rk ORDER BY stratum""".stripMargin,

    "mix3_temperature_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(n_chars) AS BIGINT) AS stratum_size
        |      FROM documents GROUP BY source),
        |q AS (SELECT source, n_docs, stratum_size,
        |        CAST(floor(sqrt(CAST(stratum_size AS DOUBLE))*1000000.0 + 0.5) AS BIGINT) AS q_weight
        |      FROM c),
        |s AS (SELECT CAST(sum(q_weight) AS BIGINT) AS tot FROM q),
        |a AS (SELECT source, n_docs, stratum_size, q_weight,
        |        CAST((100000 * q_weight) // s.tot AS BIGINT) AS base,
        |        CAST((100000 * q_weight) % s.tot AS BIGINT) AS rem
        |      FROM q, s),
        |l AS (SELECT CAST(100000 - sum(base) AS BIGINT) AS leftover FROM a),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM a)
        |SELECT source, n_docs, stratum_size, q_weight,
        |  CAST(base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r, l ORDER BY source""".stripMargin,

    // CCNet head/middle/tail: the lm1 score replay + plain ntile(3) — the
    // engine's chunked-rank + closed-form bucket must coincide exactly
    "ccn1_quality_buckets" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id,
        |        unnest(toks[1:len(toks)-1]) AS w1,
        |        unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
        |      FROM t),
        |c2 AS (SELECT bg, count(*) AS c2 FROM b GROUP BY bg),
        |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY w1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM t)),
        |q AS (SELECT b.doc_id,
        |        CAST(floor(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)
        |          * 1000000000.0 + 0.5) AS BIGINT) AS q
        |      FROM b JOIN c2 USING (bg) JOIN c1 USING (w1), v),
        |sc AS (SELECT doc_id, count(*) AS n_bigrams,
        |    CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000000.0 AS lm_score
        |  FROM q GROUP BY doc_id)
        |SELECT doc_id, lm_score,
        |  CASE ntile(3) OVER (ORDER BY lm_score DESC, doc_id)
        |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM sc ORDER BY doc_id""".stripMargin,

    // semantic decontamination: exact all-pairs cosine replay over the
    // planted fixture — equality proves the broadcast map-side scan flags
    // exactly the contaminated set (only the 20 plants reach 0.99)
    "dc3_semantic_decontaminate" ->
      s"""WITH bench AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
         |corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_concat([CAST(embedding[1] * CAST(1.001 AS FLOAT) AS FLOAT)],
         |      embedding[2:64])
         |  FROM embeddings WHERE vec_id < 20)
         |SELECT c.vec_id AS contaminated_id, min(b.vec_id) AS matched_bench_id,
         |  count(*) AS n_matches
         |FROM corpus c JOIN bench b ON ${cosSql("c.embedding", "b.embedding")} >= 0.99
         |GROUP BY c.vec_id ORDER BY contaminated_id""".stripMargin,

    // JL sign projection: the ±1 coefficients are the md5-derived constants
    // both sides share; each projected value is the identical
    // left-associated 64-term double sum, so the dump is bit-exact
    "rp1_random_projection" ->
      s"""SELECT vec_id,
         |  CAST(unnest([${(0 until 16).mkString(", ")}]) AS BIGINT) AS dim,
         |  unnest([${(0 until 16).map(k => rpProjSql("embedding", k)).mkString(",\n    ")}]) AS proj
         |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id, dim""".stripMargin,

    // projection-preserves-neighbors invariant (the s2/s3 gate pattern)
    "s5_rp_topk" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS k_full
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // fj1: the oracle is the brute-force O(n^2) definition the blocked
    // Spark plan must reproduce EXACTLY — deletion-neighborhood blocking is
    // lossless for ed<=k, so any missing pair is a bug, not tuning
    "fj1_fuzzy_join" ->
      """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,

    // er1: brute-force O(n²) edit-distance edges + recursive reachability
    // — equality with the Spark plan proves the deletion-neighborhood
    // blocking lossless AND the min-label propagation's exact fixed point
    "er1_entity_resolution" ->
      """WITH RECURSIVE b AS (SELECT c_custkey,
        |    c_name || '/' || CAST(c_custkey AS VARCHAR)
        |           || '/' || CAST(c_custkey AS VARCHAR) AS nm
        |  FROM customer WHERE c_custkey <= 2000),
        |recs AS (
        |  SELECT c_custkey * 4 AS rec_id, nm AS name FROM b
        |  UNION ALL
        |  SELECT c_custkey * 4 + 1, substr(nm, 1, 1) || substr(nm, 3) FROM b
        |  UNION ALL
        |  SELECT c_custkey * 4 + 2,
        |    substr(nm, 1, 2) || 'x' || substr(nm, 4) FROM b),
        |e AS (SELECT a.rec_id AS src, bb.rec_id AS dst
        |  FROM recs a JOIN recs bb ON a.rec_id < bb.rec_id
        |  WHERE levenshtein(a.name, bb.name) <= 1),
        |u AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |reach(id, r) AS (
        |  SELECT src, src FROM u
        |  UNION
        |  SELECT u.src, reach.r FROM u JOIN reach ON u.dst = reach.id),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
        |lab AS (SELECT recs.rec_id, recs.name,
        |    COALESCE(comp.component, recs.rec_id) AS entity_id
        |  FROM recs LEFT JOIN comp ON recs.rec_id = comp.id),
        |sz AS (SELECT entity_id, count(*) AS cluster_size FROM lab GROUP BY 1)
        |SELECT lab.rec_id, lab.name, lab.entity_id, sz.cluster_size
        |FROM lab JOIN sz USING (entity_id)""".stripMargin,

    // dq1: each rule re-stated as its set-theoretic definition; exact
    // integer counts so the hash compare is trivially stable
    "dq1_rule_audit" ->
      """SELECT 'orders_date_not_null' AS rule_name, 'orders' AS tbl,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations,
        |  count(*) AS checked FROM orders
        |UNION ALL
        |SELECT 'orders_price_range', 'orders',
        |  CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL
        |    AND (o_totalprice < 0.0 OR o_totalprice > 1e9) THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  count(*) FROM orders
        |UNION ALL
        |SELECT 'orders_status_enum', 'orders',
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
        |    AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  count(*) FROM orders
        |UNION ALL
        |SELECT 'orders_key_unique', 'orders',
        |  count(*) - count(DISTINCT o_orderkey), count(*)
        |FROM orders WHERE o_orderkey IS NOT NULL
        |UNION ALL
        |SELECT 'orders_custkey_fk', 'orders',
        |  CAST(COALESCE(SUM(CASE WHEN p.c_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT), count(*)
        |FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) c
        |LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) p
        |  ON c.o_custkey = p.c_custkey
        |UNION ALL
        |SELECT 'customer_name_format', 'customer',
        |  CAST(COALESCE(SUM(CASE WHEN c_name IS NOT NULL
        |    AND NOT regexp_matches(c_name, '^Customer#[0-9]{9}$') THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  count(*) FROM customer
        |UNION ALL
        |SELECT 'customer_acctbal_nonneg', 'customer',
        |  CAST(COALESCE(SUM(CASE WHEN c_acctbal IS NOT NULL
        |    AND (c_acctbal < 0.0 OR c_acctbal > 1e12) THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  count(*) FROM customer
        |UNION ALL
        |SELECT 'lineitem_qty_range', 'lineitem',
        |  CAST(COALESCE(SUM(CASE WHEN l_quantity IS NOT NULL
        |    AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  count(*) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_discount_range', 'lineitem',
        |  CAST(COALESCE(SUM(CASE WHEN l_discount IS NOT NULL
        |    AND (l_discount < 0.0 OR l_discount > 0.1) THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  count(*) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_pk_unique', 'lineitem',
        |  count(*) - count(DISTINCT (l_orderkey, l_linenumber)), count(*)
        |FROM lineitem WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
        |UNION ALL
        |SELECT 'lineitem_orderkey_fk', 'lineitem',
        |  CAST(COALESCE(SUM(CASE WHEN p.o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT), count(*)
        |FROM (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) c
        |LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p
        |  ON c.l_orderkey = p.o_orderkey
        |UNION ALL
        |SELECT 'events_type_enum', 'events',
        |  CAST(COALESCE(SUM(CASE WHEN event_type IS NOT NULL
        |    AND event_type NOT IN ('click','signup','error','view','purchase')
        |    THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  count(*) FROM events""".stripMargin,

    // drift1/drift2: same per-bin evidence contract as the Spark side —
    // exact counts, one IEEE division per share, rational divergence term
    // (no ln, no eps; see Drift.scala)
    "drift1_numeric" ->
      """WITH a AS (SELECT LEAST(GREATEST(CAST(floor((o_totalprice - 0.0) / 25000.0) AS BIGINT), 0), 19) AS bin
        |           FROM orders WHERE o_totalprice IS NOT NULL
        |             AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        |     b AS (SELECT LEAST(GREATEST(CAST(floor((o_totalprice - 0.0) / 25000.0) AS BIGINT), 0), 19) AS bin
        |           FROM orders WHERE o_totalprice IS NOT NULL
        |             AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
        |     ac AS (SELECT bin, count(*) AS cnt_a FROM a GROUP BY bin),
        |     bc AS (SELECT bin, count(*) AS cnt_b FROM b GROUP BY bin),
        |     bins AS (SELECT unnest(generate_series(0, 19)) AS bin),
        |     f AS (SELECT bins.bin, CAST(COALESCE(ac.cnt_a, 0) AS BIGINT) AS cnt_a,
        |                  CAST(COALESCE(bc.cnt_b, 0) AS BIGINT) AS cnt_b
        |           FROM bins LEFT JOIN ac ON bins.bin = ac.bin
        |                     LEFT JOIN bc ON bins.bin = bc.bin),
        |     t AS (SELECT SUM(cnt_a) AS ta, SUM(cnt_b) AS tb FROM f),
        |     sh AS (SELECT f.bin, f.cnt_a, f.cnt_b,
        |            CASE WHEN t.ta > 0 THEN CAST(f.cnt_a AS DOUBLE) / t.ta ELSE 0.0 END AS share_a,
        |            CASE WHEN t.tb > 0 THEN CAST(f.cnt_b AS DOUBLE) / t.tb ELSE 0.0 END AS share_b
        |            FROM f CROSS JOIN t)
        |SELECT bin, cnt_a, cnt_b, share_a, share_b,
        |  CASE WHEN share_a + share_b > 0
        |    THEN ((share_a - share_b) * (share_a - share_b)) / (share_a + share_b)
        |    ELSE 0.0 END AS divergence
        |FROM sh""".stripMargin,

    "drift2_categorical" ->
      """WITH a AS (SELECT o_orderpriority AS value, count(*) AS cnt_a FROM orders
        |           WHERE o_orderpriority IS NOT NULL
        |             AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1),
        |     b AS (SELECT o_orderpriority AS value, count(*) AS cnt_b FROM orders
        |           WHERE o_orderpriority IS NOT NULL
        |             AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1),
        |     f AS (SELECT COALESCE(a.value, b.value) AS value,
        |                  CAST(COALESCE(a.cnt_a, 0) AS BIGINT) AS cnt_a,
        |                  CAST(COALESCE(b.cnt_b, 0) AS BIGINT) AS cnt_b
        |           FROM a FULL OUTER JOIN b ON a.value = b.value),
        |     t AS (SELECT SUM(cnt_a) AS ta, SUM(cnt_b) AS tb FROM f),
        |     sh AS (SELECT f.value, f.cnt_a, f.cnt_b,
        |            CASE WHEN t.ta > 0 THEN CAST(f.cnt_a AS DOUBLE) / t.ta ELSE 0.0 END AS share_a,
        |            CASE WHEN t.tb > 0 THEN CAST(f.cnt_b AS DOUBLE) / t.tb ELSE 0.0 END AS share_b
        |            FROM f CROSS JOIN t)
        |SELECT value, cnt_a, cnt_b, share_a, share_b,
        |  CASE WHEN share_a + share_b > 0
        |    THEN ((share_a - share_b) * (share_a - share_b)) / (share_a + share_b)
        |    ELSE 0.0 END AS divergence
        |FROM sh""".stripMargin,

    // scd1: run detection (row 1 or value change) -> running run id ->
    // run compaction -> interval chaining; the (ts, event_id) tie-break
    // pins total order, so both engines build identical runs
    "scd1_history" ->
      """WITH flagged AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN row_number() OVER w = 1
        |           OR event_type IS DISTINCT FROM lag(event_type) OVER w
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs0 AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS run FROM flagged),
        |runs AS (
        |  SELECT user_id, CAST(run AS BIGINT) AS run,
        |         MIN(event_type) AS event_type, MIN(ts) AS valid_from,
        |         count(*) AS n_events
        |  FROM runs0 GROUP BY user_id, run)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) AS valid_to,
        |  n_events
        |FROM runs""".stripMargin,

    // bm25: rational-idf Okapi BM25 (k1=1.2, b=0.75), arithmetic mirrored
    // op-for-op; per-doc totals via the 6dp quantized exact sum
    "bm25_topk" ->
      """WITH lens AS (SELECT doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n,
        |    CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM lens),
        |tok AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |per AS (SELECT tf.doc_id,
        |    ((n - df + 0.5) / (df + 0.5)) *
        |    ((CAST(tf AS DOUBLE) * 2.2) /
        |     (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS s
        |  FROM tf JOIN dft USING (term)
        |       JOIN lens ON tf.doc_id = lens.doc_id, stats)
        |SELECT doc_id,
        |  CAST(SUM(CAST(floor(s * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 1000000.0 AS score
        |FROM per GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // the s2/s3 recall-gate pattern: PQ's ADC shortlist + exact re-rank
    // must keep ≥8/10 recall with the full k returned
    "s6_pq_topk" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS k_full
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // IVF routing × PQ distances: both approximations gated at once
    "s7_ivfpq_topk" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS k_full
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // fn1: stage i = first qualifying event strictly after stage i-1's
    // reach time; users per stage are scalar subqueries over the chain
    "fn1_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |     s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |            JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |            WHERE e.event_type = 'click' GROUP BY 1),
        |     s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |            JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |            WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
        |       (SELECT count(*) FROM s1) AS users
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin,

    // coh1: ISO-Monday week truncation both sides; offset = exact
    // day-difference // 7 (weeks are aligned, so it divides exactly)
    "coh1_cohorts" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1)
        |SELECT CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
        |  CAST(date_diff('day', CAST(date_trunc('week', f.first_ts) AS DATE),
        |    CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT e.user_id) AS users
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,

    // drift3: one generated block per column spec, unioned, divergence on
    // top — values must equal the fused single-scan Spark plan exactly
    "drift3_multi" -> {
      val blocks = Seq(
        ("l_quantity", 1.0, 51.0, 10),
        ("l_extendedprice", 0.0, 100000.0, 20),
        ("l_discount", 0.0, 0.1, 5))
        .map((driftColSql _).tupled).mkString("\nUNION ALL\n")
      s"""SELECT col_name, bin, cnt_a, cnt_b, share_a, share_b,
         |  CASE WHEN share_a + share_b > 0
         |    THEN ((share_a - share_b) * (share_a - share_b)) / (share_a + share_b)
         |    ELSE 0.0 END AS divergence
         |FROM ($blocks)""".stripMargin
    },

    // c11b: nearest-dictionary-entry repair, ties by (distance, value) —
    // the correlated ORDER BY ... LIMIT 1 restates array_min over structs
    "c11b_fuzzy_canon" ->
      """WITH d AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 5 = 0 THEN substr(c_mktsegment, 2)
        |       WHEN c_custkey % 5 = 1 THEN
        |         concat(substr(c_mktsegment, 1, 1), 'x', substr(c_mktsegment, 3))
        |       WHEN c_custkey % 5 = 2 THEN concat('z', c_mktsegment)
        |       ELSE c_mktsegment END AS dirty
        |  FROM customer)
        |SELECT c_custkey, dirty,
        |  COALESCE((SELECT v FROM (VALUES ('AUTOMOBILE'), ('BUILDING'),
        |      ('FURNITURE'), ('HOUSEHOLD'), ('MACHINERY')) t(v)
        |    WHERE levenshtein(dirty, v) <= 1
        |    ORDER BY levenshtein(dirty, v), v LIMIT 1), dirty) AS canonical
        |FROM d""".stripMargin,

    // h1: the planted-HTML fixture rebuilt with ||, then every extraction
    // rule replayed — whole-element strips, block split on the same tag
    // alternation, per-block visible/link-char structs, the integer
    // link-density filter (2*lc <= vis), ordered join, entity decode
    // (&amp; last), final collapse. Regexes live in the Java∩RE2 subset
    // so both engines read them identically.
    "h1_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</title><style>p{margin:0}</style><script>var id=' ||
        |  CAST(doc_id AS VARCHAR) || ';</script></head><body>' ||
        |  '<div><a href="/">Home</a> <a href="/about">About</a> nav</div>' ||
        |  '<p>' || text || '</p>' ||
        |  '<!-- hidden ' || CAST(doc_id AS VARCHAR) || ' -->' ||
        |  CASE WHEN doc_id % 3 = 0 THEN '<ul><li><a href="/x">x' ||
        |    CAST(doc_id AS VARCHAR) || '</a></li></ul>' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN
        |    '<p>terms &amp; conditions &quot;apply&quot; &lt;here&gt; &#39;now&#39;&nbsp;always</p>'
        |    ELSE '' END ||
        |  '<p>as noted in <a href="/ref' || CAST(doc_id AS VARCHAR) ||
        |  '">reference ' || CAST(doc_id AS VARCHAR) ||
        |  '</a> the corpus continues</p>' ||
        |  '<div>copyright <a href="/c">contact</a> <a href="/p">privacy</a> <a href="/t">terms</a></div>' ||
        |  '</body></html>' AS html
        |  FROM documents),
        |pre AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |    '(?is)<head[^>]*>.*?</head>', ' ', 'g'),
        |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g') AS body
        |  FROM h),
        |blk AS (SELECT doc_id, string_split_regex(body,
        |    '(?i)</?(?:html|head|body|title|p|div|br|hr|h[1-6]|ul|ol|li|table|thead|tbody|tr|td|th|section|article|header|footer|nav|blockquote|pre|form)[^>]*>') AS blocks
        |  FROM pre),
        |m AS (SELECT doc_id, list_transform(blocks, b -> struct_pack(
        |    vis := trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'),
        |      '[ \t\n\r]+', ' ', 'g')),
        |    lc := coalesce(list_sum(list_transform(
        |      regexp_extract_all(b, '(?is)<a(?:[ \t\n\r][^>]*)?>(.*?)</a[ \t\n\r]*>', 1),
        |      x -> length(regexp_replace(x, '<[^>]*>', '', 'g')))), 0))) AS bs
        |  FROM blk),
        |k AS (SELECT doc_id,
        |    list_filter(bs, s -> length(s.vis) > 0) AS nonempty,
        |    list_filter(bs, s -> length(s.vis) > 0
        |      AND 2 * s.lc <= length(s.vis)) AS kept
        |  FROM m)
        |SELECT doc_id,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      array_to_string(list_transform(kept, s -> s.vis), ' '),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&nbsp;', ' '), '&amp;', '&'),
        |    '[ \t\n\r]+', ' ', 'g')) AS main_text,
        |  CAST(length(nonempty) AS BIGINT) AS n_blocks,
        |  CAST(length(kept) AS BIGINT) AS n_kept
        |FROM k
        |ORDER BY doc_id""".stripMargin,

    // cp8: extraction wired AHEAD of the gates — planted %11 copies whose
    // HTML differs from the original only in STRIPPED regions (head_id in
    // title/script/comment; all body content from body_id = id % 2M), the
    // h1 extraction chain, then the cp1 gate replay on the EXTRACTED text
    // and the cp7 set-hash threshold-1.0 near-dedup. The copies collapse
    // in exact dedup iff extraction removed the differing head/comments.
    "cp8_html_pipeline" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, doc_id AS head_id, doc_id AS body_id, text
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id, doc_id + 2000000 AS head_id,
         |    doc_id AS body_id, text
         |  FROM documents WHERE doc_id % 11 = 0),
         |h AS (SELECT doc_id,
         |  '<html><head><title>Doc ' || CAST(head_id AS VARCHAR) ||
         |  '</title><style>p{margin:0}</style><script>var id=' ||
         |  CAST(head_id AS VARCHAR) || ';</script></head><body>' ||
         |  '<div><a href="/">Home</a> <a href="/about">About</a> nav</div>' ||
         |  '<p>' || text || '</p>' ||
         |  '<!-- hidden ' || CAST(head_id AS VARCHAR) || ' -->' ||
         |  CASE WHEN body_id % 3 = 0 THEN '<ul><li><a href="/x">x' ||
         |    CAST(body_id AS VARCHAR) || '</a></li></ul>' ELSE '' END ||
         |  CASE WHEN body_id % 5 = 0 THEN
         |    '<p>terms &amp; conditions &quot;apply&quot; &lt;here&gt; &#39;now&#39;&nbsp;always</p>'
         |    ELSE '' END ||
         |  '<p>as noted in <a href="/ref' || CAST(body_id AS VARCHAR) ||
         |  '">reference ' || CAST(body_id AS VARCHAR) ||
         |  '</a> the corpus continues</p>' ||
         |  '<div>copyright <a href="/c">contact</a> <a href="/p">privacy</a> <a href="/t">terms</a></div>' ||
         |  '</body></html>' AS html
         |  FROM corpus),
         |pre AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
         |    '(?is)<head[^>]*>.*?</head>', ' ', 'g'),
         |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |    '(?s)<!--.*?-->', ' ', 'g') AS body
         |  FROM h),
         |blk AS (SELECT doc_id, string_split_regex(body,
         |    '(?i)</?(?:html|head|body|title|p|div|br|hr|h[1-6]|ul|ol|li|table|thead|tbody|tr|td|th|section|article|header|footer|nav|blockquote|pre|form)[^>]*>') AS blocks
         |  FROM pre),
         |m AS (SELECT doc_id, list_transform(blocks, b -> struct_pack(
         |    vis := trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'),
         |      '[ \t\n\r]+', ' ', 'g')),
         |    lc := coalesce(list_sum(list_transform(
         |      regexp_extract_all(b, '(?is)<a(?:[ \t\n\r][^>]*)?>(.*?)</a[ \t\n\r]*>', 1),
         |      x -> length(regexp_replace(x, '<[^>]*>', '', 'g')))), 0))) AS bs
         |  FROM blk),
         |k AS (SELECT doc_id,
         |    list_filter(bs, s -> length(s.vis) > 0
         |      AND 2 * s.lc <= length(s.vis)) AS kept
         |  FROM m),
         |ext AS (SELECT doc_id,
         |  trim(regexp_replace(
         |    replace(replace(replace(replace(replace(replace(
         |      array_to_string(list_transform(kept, s -> s.vis), ' '),
         |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
         |      '&nbsp;', ' '), '&amp;', '&'),
         |    '[ \t\n\r]+', ' ', 'g')) AS text
         |  FROM k),
         |sc AS (SELECT doc_id, text,
         |    $qualitySql AS quality,
         |    $nTokensSql AS n_tokens,
         |  $langScoreCols
         |  FROM ext),
         |meta AS (SELECT doc_id, text, quality, n_tokens,
         |    $langPredSql AS lang
         |  FROM sc),
         |gated AS (SELECT * FROM meta
         |  WHERE n_tokens BETWEEN 5 AND 100000 AND quality >= 0.3),
         |fp AS (SELECT doc_id, text, quality, n_tokens, lang,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
         |  FROM gated),
         |exact AS (SELECT * FROM fp
         |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
         |shh AS (SELECT doc_id,
         |    md5(array_to_string(list_sort($trigramSetSql), chr(10))) AS shash
         |  FROM (SELECT doc_id, $tokSplit AS toks FROM exact)),
         |nd AS (SELECT e.* FROM exact e JOIN shh USING (doc_id)
         |  WHERE doc_id IN (SELECT min(doc_id) FROM shh GROUP BY shash))
         |SELECT doc_id, lang, n_tokens, quality FROM nd
         |ORDER BY doc_id""".stripMargin,

    // fj2: the prefix-blocked JW join replayed with DuckDB's OWN
    // jaro_winkler_similarity (an independent implementation of the
    // rapidfuzz convention) — prefix-equality join, 6dp quantize on both
    // sides, threshold on the quantized value
    "fj2_jw_join" ->
      """WITH base AS (SELECT c_custkey AS k,
        |    translate(reverse(substr(c_name, 10, 9)),
        |      '0123456789', 'abcdefghij') AS nm
        |  FROM customer WHERE c_custkey <= 2000),
        |recs AS (
        |  SELECT k * 4 AS rec_id, nm AS name FROM base
        |  UNION ALL
        |  SELECT k * 4 + 1, substr(nm, 1, 5) || 'x' || substr(nm, 7, 3)
        |  FROM base
        |  UNION ALL
        |  SELECT k * 4 + 2, nm || 'z' FROM base
        |  UNION ALL
        |  SELECT k * 4 + 3, substr(nm, 1, 4) || 'zzzzz' FROM base),
        |p AS (SELECT a.rec_id AS id_a, b.rec_id AS id_b,
        |    a.name AS str_a, b.name AS str_b,
        |    floor(jaro_winkler_similarity(a.name, b.name) * 1e6 + 0.5) / 1e6
        |      AS sim
        |  FROM recs a JOIN recs b
        |    ON substr(a.name, 1, 4) = substr(b.name, 1, 4)
        |    AND a.rec_id < b.rec_id)
        |SELECT id_a, id_b, str_a, str_b, sim FROM p
        |WHERE sim >= 0.95
        |ORDER BY id_a, id_b""".stripMargin,

    // pp1: the FLAT twin of the day-partitioned layout — the same three
    // days selected by the timestamp-derived day string (what the dt=
    // directories encode), HUGEINT-exact value sum. Hash equality proves
    // the re-layout lost/duplicated nothing and the dt derivation matches
    // the partition values.
    "pp1_partition_pruning" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') IN
        |  ('2024-01-10', '2024-01-11', '2024-01-12')
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // orc1: the flat-parquet twin of the ORC re-layout aggregate —
    // DuckDB can't read ORC, so hash equality on the parquet original
    // IS the losslessness proof (pp1 convention)
    "orc1_orc_relayout" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(floor(l_quantity * 1e6 + 0.5) AS HUGEINT))
        |    AS DOUBLE) / 1e6 AS total_qty,
        |  CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e6
        |    + 0.5) AS HUGEINT)) AS DOUBLE) / 1e6 AS total_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // pp3: flat twin of the z-order cohort+window aggregate
    "pp3_zorder_skipping" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value
        |FROM events
        |WHERE user_id < 128
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // pp2: flat twin of the row-group-skipping window — same 3 days as
    // pp1, expressed as the ts range the sorted layout skips on
    "pp2_rowgroup_skipping" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // pp5: flat twin of the page-skipping window — same 3 days as pp2,
    // the physical layout (one row group, tiny pages) is the only change
    "pp5_page_skipping" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // dpp1: the FLAT twin of the runtime-pruned star join — DuckDB
    // rebuilds the same calendar dim (distinct day + week_of_month =
    // ((dayofmonth-1) // 7) + 1), applies the same selective dim filter,
    // and joins on the timestamp-derived day. Hash equality proves the
    // dynamically-pruned partitioned join computed exactly the flat
    // answer.
    "dpp1_dynamic_pruning" ->
      """WITH cal AS (
        |  SELECT day,
        |    CAST(((dayofmonth(day) - 1) // 7) + 1 AS INT) AS week_of_month
        |  FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)),
        |sel AS (SELECT day FROM cal WHERE week_of_month = 2)
        |SELECT e.event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(e.value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value
        |FROM events e JOIN sel ON CAST(e.ts AS DATE) = sel.day
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin,

    // pp4: flat twin of the composite-layout star join — dpp1's dim
    // derivation + join, plus the pp3 cohort predicate; hash equality
    // proves the doubly-pruned partitioned+z-ordered scan computed
    // exactly the flat answer
    "pp4_composite_pruning" ->
      """WITH cal AS (
        |  SELECT day,
        |    CAST(((dayofmonth(day) - 1) // 7) + 1 AS INT) AS week_of_month
        |  FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)),
        |sel AS (SELECT day FROM cal WHERE week_of_month = 2)
        |SELECT e.event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(e.value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value
        |FROM events e JOIN sel ON CAST(e.ts AS DATE) = sel.day
        |WHERE e.user_id < 128
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin,

    // p20: per-category -p*ln(p) terms 6dp-quantized to integers, exact
    // sum, one /1e6 finish — the zipf1 log convention
    "p20_entropy_profile" -> {
      def ent(table: String, c: String, label: String) =
        s"""(WITH g AS (SELECT $c AS v, CAST(count(*) AS BIGINT) AS cc
           |  FROM $table WHERE $c IS NOT NULL GROUP BY $c),
           |t AS (SELECT CAST(SUM(cc) AS BIGINT) AS n,
           |    CAST(count(*) AS BIGINT) AS nd FROM g)
           |SELECT '$label' AS column_name, t.n AS n_rows,
           |  t.nd AS n_distinct,
           |  CAST(SUM(CAST(floor(-(CAST(cc AS DOUBLE) / t.n) *
           |    ln(CAST(cc AS DOUBLE) / t.n) * 1e6 + 0.5) AS BIGINT))
           |    AS DOUBLE) / 1e6 AS entropy
           |FROM g, t GROUP BY t.n, t.nd)""".stripMargin
      s"""SELECT * FROM (
         |${ent("events", "event_type", "events.event_type")}
         |UNION ALL
         |${ent("orders", "o_orderpriority", "orders.o_orderpriority")}
         |UNION ALL
         |${ent("documents", "lang", "documents.lang")})
         |ORDER BY column_name""".stripMargin
    },

    // mor1: the merge-on-read delete must equal the COW twin's closed
    // form — complement count/mass, zero window survivors — the sidecar
    // marks exactly the window's rows, and the optimize fold is
    // data-invariant
    "mor1_merge_on_read_delete" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_v2,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value_v2,
        |  CAST(0 AS BIGINT) AS n_window_v2,
        |  CAST(count(*) AS BIGINT) AS n_v3,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value_v3,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events
        |   WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |     AND ts < TIMESTAMP '2024-01-13 00:00:00') AS n_dv_positions,
        |  TRUE AS files_identical,
        |  TRUE AS dv_present,
        |  TRUE AS dv_folded
        |FROM events
        |WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00')""".stripMargin,

    // cdc2: the row-tagged feed's closed form — the up1 MERGE yields one
    // pre/post pair per 2024-01-20 row (original vs +1000 mass) plus the
    // shadow inserts; the tt1 delete yields all-delete tags over its
    // window; the +1000 bump is the same IEEE double add on both sides
    "cdc2_row_tagged_feed" ->
      """WITH win AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |del AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00')
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM win) AS n_insert,
        |  (SELECT CAST(count(*) AS BIGINT) FROM win) AS n_update_pre,
        |  (SELECT CAST(count(*) AS BIGINT) FROM win) AS n_update_post,
        |  CAST(0 AS BIGINT) AS n_delete_up,
        |  (SELECT CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |     AS DOUBLE) / 1e6 FROM win) AS pre_value,
        |  (SELECT CAST(SUM(CAST(floor((value + 1000) * 1e6 + 0.5)
        |     AS HUGEINT)) AS DOUBLE) / 1e6 FROM win) AS post_value,
        |  (SELECT CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |     AS DOUBLE) / 1e6 FROM win) AS insert_value,
        |  (SELECT CAST(count(*) AS BIGINT) FROM del) AS n_delete,
        |  (SELECT CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |     AS DOUBLE) / 1e6 FROM del) AS delete_value,
        |  CAST(0 AS BIGINT) AS n_nondelete_tags""".stripMargin,

    // ss1: the consumer's fold must equal the lc1 lifecycle closed form
    // — bump the 01-20 day, add its shadow inserts, add the evolved
    // 01-25 append, strip the deleted 01-10..13 window; the optimize
    // delta is empty by multiset cancellation
    "ss1_snapshot_source_fold" ->
      """WITH d20 AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |d25 AS (
        |  SELECT ts, value, floor(value * 0.5 * 1e6 + 0.5) / 1e6 AS qs
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-26 00:00:00'),
        |merged AS (
        |  SELECT ts,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-21 00:00:00'
        |      THEN value + 1000 ELSE value END AS value,
        |    CAST(NULL AS DOUBLE) AS qs
        |  FROM events
        |  UNION ALL SELECT ts, value, CAST(NULL AS DOUBLE) FROM d20
        |  UNION ALL SELECT ts, value, qs FROM d25),
        |final AS (
        |  SELECT * FROM merged
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00'))
        |SELECT CAST(count(*) AS BIGINT) AS n_final,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(SUM(CAST(floor(qs * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_quality,
        |  CAST(SUM(CASE WHEN qs IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_quality,
        |  CAST(4 AS BIGINT) AS n_versions_processed,
        |  TRUE AS exactly_once
        |FROM final""".stripMargin,

    // ss2: the native streaming source's sign-weighted fold must equal
    // the SAME lifecycle closed form ss1 pins (base v1 rides the feed,
    // so 5 versions); batching/exactly-once laws engine-verified
    "ss2_native_stream_fold" ->
      """WITH d20 AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |d25 AS (
        |  SELECT ts, value, floor(value * 0.5 * 1e6 + 0.5) / 1e6 AS qs
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-26 00:00:00'),
        |merged AS (
        |  SELECT ts,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-21 00:00:00'
        |      THEN value + 1000 ELSE value END AS value,
        |    CAST(NULL AS DOUBLE) AS qs
        |  FROM events
        |  UNION ALL SELECT ts, value, CAST(NULL AS DOUBLE) FROM d20
        |  UNION ALL SELECT ts, value, qs FROM d25),
        |final AS (
        |  SELECT * FROM merged
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00'))
        |SELECT CAST(count(*) AS BIGINT) AS n_final,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(SUM(CAST(floor(qs * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_quality,
        |  CAST(SUM(CASE WHEN qs IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_quality,
        |  CAST(5 AS BIGINT) AS n_versions_processed,
        |  TRUE AS bounded_exactly_once
        |FROM final""".stripMargin,

    // mf3: the conjunctive-pruned query must equal the flat twin; the
    // selection-law gates are booleans the engine computes from the
    // manifest itself
    "mf3_two_column_manifest" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(16 AS BIGINT) AS files_total,
        |  TRUE AS intersection_law,
        |  TRUE AS strict_subset,
        |  TRUE AS no_wider_than_either,
        |  TRUE AS scan_within_selection,
        |  TRUE AS manifest_complete
        |FROM events
        |WHERE user_id < 8
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'""".stripMargin,

    // se2: the evolved-table replay — base events (flag NULL) plus the
    // 01-25 day at flag=1 and the 01-26 day at flag=2; `value` reads as
    // `reading` after the rename; v6 (optimize) must pin identically
    "se2_rename_widen" ->
      """WITH d25 AS (
        |  SELECT value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-26 00:00:00'),
        |d26 AS (
        |  SELECT value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-26 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-27 00:00:00'),
        |evolved AS (
        |  SELECT value, CAST(NULL AS BIGINT) AS flag FROM events
        |  UNION ALL SELECT value, 1 FROM d25
        |  UNION ALL SELECT value, 2 FROM d26)
        |SELECT CAST(count(*) AS BIGINT) AS n_v5,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS reading_v5,
        |  CAST(SUM(flag) AS BIGINT) AS flag_v5,
        |  CAST(SUM(CASE WHEN flag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS nullflag_v5,
        |  CAST(count(*) AS BIGINT) AS n_v6,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS reading_v6,
        |  CAST(SUM(flag) AS BIGINT) AS flag_v6,
        |  CAST(SUM(CASE WHEN flag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS nullflag_v6,
        |  TRUE AS v5_mapped,
        |  TRUE AS v6_materialized,
        |  CAST(4 AS BIGINT) AS files_final
        |FROM evolved""".stripMargin,

    // tt3: RESTORE returns the table to the pre-delete whole-table
    // state (count/mass closed-form); the deleted intermediate version
    // stays readable; layout/refusal gates are engine booleans
    "tt3_restore" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_restored,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS value_restored,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events
        |   WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |     AND ts < TIMESTAMP '2024-01-13 00:00:00')) AS n_v2,
        |  CAST(3 AS BIGINT) AS latest_version,
        |  TRUE AS files_match_v1,
        |  TRUE AS sidecar_cleared,
        |  TRUE AS out_of_range_refused
        |FROM events""".stripMargin,

    // eq1: the equality-delete MERGE's result is the up1 closed-form
    // replay (window bumped + shadow rows), identical at v2 (sidecar
    // live) and v3 (optimize folded); layout gates are engine booleans
    "eq1_equality_upsert" ->
      """WITH win AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |merged AS (
        |  SELECT ts,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-21 00:00:00'
        |      THEN value + 1000 ELSE value END AS value
        |  FROM events
        |  UNION ALL SELECT ts, value FROM win)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_v1,
        |  CAST(count(*) AS BIGINT) AS n_latest,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value_latest,
        |  (SELECT CAST(2 * count(*) AS BIGINT) FROM win)
        |    AS n_window_latest,
        |  CAST(count(*) AS BIGINT) AS n_opt,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS value_opt,
        |  TRUE AS eq_sidecar_live,
        |  TRUE AS files_all_reused,
        |  TRUE AS eq_folded
        |FROM merged""".stripMargin,

    // spj1: the storage-partitioned join's RESULT is the plain join —
    // per-segment order counts and 6dp price mass (the engine's
    // post-bucketing INSERT adds only keys < 0, which match no
    // customer); the no-exchange, twin-equality, and append-layout-
    // maintenance gates are engine booleans
    "spj1_bucketed_join" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT))
        |    AS DOUBLE) / 1e6 AS total_price,
        |  TRUE AS spj_join_unshuffled,
        |  TRUE AS rows_match_twin,
        |  TRUE AS layout_maintained
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    // spj2: the bucket-pruned point lookup's RESULT is the plain
    // aggregate at the MIN custkey (closed-form on both sides); the
    // planned-files-subset-of-one-bucket gate is an engine boolean
    "spj2_bucket_pruned_lookup" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS HUGEINT))
        |    AS DOUBLE) / 1e6 AS total_price,
        |  TRUE AS pruned_to_bucket
        |FROM orders
        |WHERE o_custkey = (SELECT min(o_custkey) FROM orders)""".stripMargin,

    // mt1: sidecar compaction is lossless — the merged sidecar's marks
    // equal the three delete windows' row count; the live set (count +
    // 6dp mass) is the closed-form survivor set and equals the
    // pre-compaction read; layout gates are engine booleans
    "mt1_compact_sidecars" ->
      """WITH windows AS (
        |  SELECT value,
        |    ((ts >= TIMESTAMP '2024-01-05 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-06 00:00:00')
        |    OR (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-13 00:00:00')
        |    OR (ts >= TIMESTAMP '2024-01-20 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-21 00:00:00')) AS marked
        |  FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_live,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS value_live,
        |  CAST(count(*) AS BIGINT) AS n_pre_compact,
        |  (SELECT CAST(count(*) AS BIGINT) FROM windows WHERE marked)
        |    AS marked_positions,
        |  CAST(3 AS BIGINT) AS sidecars_before,
        |  CAST(1 AS BIGINT) AS sidecars_after,
        |  CAST(5 AS BIGINT) AS latest_version,
        |  TRUE AS files_untouched,
        |  TRUE AS bitmap_parts_readable
        |FROM windows WHERE NOT marked""".stripMargin,

    // se3: DROP COLUMN is metadata-only and lossless for the surviving
    // columns — counts/mass at v2 (tombstone) and v3 (optimize) equal
    // the raw table; hide/serve/refusal gates are engine booleans
    "se3_drop_column" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_v2,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS value_v2,
        |  CAST(count(*) AS BIGINT) AS n_v3,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS value_v3,
        |  CAST(SUM(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS props_nonnull_v1,
        |  TRUE AS hidden_v2,
        |  TRUE AS hidden_v3,
        |  TRUE AS served_v1,
        |  TRUE AS tombstone_kept,
        |  TRUE AS physical_gone_v3,
        |  TRUE AS stats_drop_refused,
        |  TRUE AS redrop_refused
        |FROM events""".stripMargin,

    // oz1: the z-order recompaction is lossless (whole-table count/mass)
    // and the conjunctive window equals the flat twin; the layout gates
    // are engine-computed booleans
    "oz1_optimize_zorder" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_v1,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_v2,
        |  (SELECT CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |     AS DOUBLE) / 1e6 FROM events) AS total_value_v2,
        |  CAST(count(*) AS BIGINT) AS n_window,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS window_value,
        |  CAST(16 AS BIGINT) AS files_v2,
        |  TRUE AS zorder_prunes,
        |  TRUE AS scan_within_selection
        |FROM events
        |WHERE user_id < 8
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'""".stripMargin,

    // mor2: user-3 erasure — complement count/mass, the sidecar marks
    // exactly the user's rows, v1 unchanged
    "mor2_key_erasure" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_v1,
        |  CAST(count(*) AS BIGINT) AS n_v2,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value_v2,
        |  CAST(0 AS BIGINT) AS n_user3_v2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events WHERE user_id = 3)
        |    AS n_dv_positions,
        |  TRUE AS files_identical,
        |  TRUE AS dv_present
        |FROM events
        |WHERE user_id <> 3""".stripMargin,

    // rep1: the CDC replica must fold to the lc1 lifecycle closed form,
    // and the engine-computed two-way exceptAll equality is the row gate
    "rep1_cdc_replica" ->
      """WITH d20 AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |d25 AS (
        |  SELECT ts, value, floor(value * 0.5 * 1e6 + 0.5) / 1e6 AS qs
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-26 00:00:00'),
        |merged AS (
        |  SELECT ts,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-21 00:00:00'
        |      THEN value + 1000 ELSE value END AS value,
        |    CAST(NULL AS DOUBLE) AS qs
        |  FROM events
        |  UNION ALL SELECT ts, value, CAST(NULL AS DOUBLE) FROM d20
        |  UNION ALL SELECT ts, value, qs FROM d25),
        |final AS (
        |  SELECT * FROM merged
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00'))
        |SELECT CAST(count(*) AS BIGINT) AS n_final,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(SUM(CAST(floor(qs * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_quality,
        |  CAST(SUM(CASE WHEN qs IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_quality,
        |  TRUE AS replica_identical,
        |  CAST(5 AS BIGINT) AS n_versions
        |FROM final""".stripMargin,

    // bf1: the point-lookup rows for the same closed-form key set (global
    // min/max id + the window's min id); layout gates engine-computed
    "bf1_bloom_point_lookup" ->
      """WITH ks AS (
        |  SELECT min(event_id) AS k FROM events
        |  UNION SELECT max(event_id) FROM events
        |  UNION SELECT min(event_id) FROM events
        |    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-13 00:00:00')
        |SELECT CAST(count(*) AS BIGINT) AS n_hits,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS hit_value,
        |  CAST(16 AS BIGINT) AS files_total,
        |  TRUE AS no_false_negative,
        |  TRUE AS bloom_prunes,
        |  TRUE AS scan_within_selection
        |FROM events
        |WHERE event_id IN (SELECT k FROM ks)""".stripMargin,

    // oc1: the packed table = events plus the three accreted day slices
    // (ids offset, values unchanged); pre-pack pins the same values —
    // the pack moved bytes, not data
    "oc1_incremental_binpack" ->
      """WITH acc AS (
        |  SELECT value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-27 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-30 00:00:00'),
        |allr AS (
        |  SELECT value FROM events
        |  UNION ALL SELECT value FROM acc)
        |SELECT CAST(count(*) AS BIGINT) AS n_packed,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS value_packed,
        |  CAST(count(*) AS BIGINT) AS n_prepack,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS value_prepack,
        |  CAST(7 AS BIGINT) AS files_prepack,
        |  TRUE AS pack_reduced,
        |  TRUE AS history_untouched
        |FROM allr""".stripMargin,

    // mc1: the delta-chain table's closed form — events plus FIVE copies
    // of the appended 2024-01-26 day minus the deleted window; the
    // chain/checkpoint/bounded-commit laws are engine-verified booleans
    "mc1_incremental_manifest" ->
      """WITH d26 AS (
        |  SELECT ts, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-26 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-27 00:00:00'),
        |allr AS (
        |  SELECT ts, value FROM events
        |  UNION ALL SELECT ts, value FROM d26
        |  UNION ALL SELECT ts, value FROM d26
        |  UNION ALL SELECT ts, value FROM d26
        |  UNION ALL SELECT ts, value FROM d26
        |  UNION ALL SELECT ts, value FROM d26),
        |final AS (
        |  SELECT * FROM allr
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00'))
        |SELECT CAST(count(*) AS BIGINT) AS n_final,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(7 AS BIGINT) AS n_versions,
        |  TRUE AS chain_resolves,
        |  TRUE AS checkpoint_law,
        |  TRUE AS bounded_commits
        |FROM final""".stripMargin,

    // ms1: the mor1 closed form (complement count/mass, zero window
    // survivors, sidecar == window) with the footer-free plan/read
    // gates engine-verified via the thread-local footer counter
    "ms1_manifest_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_v2,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value_v2,
        |  CAST(0 AS BIGINT) AS n_window_v2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events
        |   WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |     AND ts < TIMESTAMP '2024-01-13 00:00:00') AS n_dv_positions,
        |  TRUE AS plan_footer_free,
        |  TRUE AS read_footer_free
        |FROM events
        |WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00')""".stripMargin,

    // tt2: as-of v2 = events + the appended 01-25 day; as-of v3 = that
    // minus the deleted window; resolution laws engine-verified
    "tt2_timestamp_travel" ->
      """WITH d25 AS (
        |  SELECT ts, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-26 00:00:00'),
        |v2 AS (
        |  SELECT ts, value FROM events
        |  UNION ALL SELECT ts, value FROM d25),
        |v3 AS (
        |  SELECT * FROM v2
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00'))
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM v2) AS n_asof_v2,
        |  (SELECT CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |     AS DOUBLE) / 1e6 FROM v2) AS value_asof_v2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM v3) AS n_asof_v3,
        |  (SELECT CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |     AS DOUBLE) / 1e6 FROM v3) AS value_asof_v3,
        |  TRUE AS boundary_exact,
        |  TRUE AS mid_gap_resolves_floor,
        |  TRUE AS future_resolves_latest,
        |  TRUE AS prehistory_throws""".stripMargin,

    // mor3: the MoR MERGE must pin the SAME closed form as the COW up1
    // twin (window bumped +1000 plus shadow inserts), with the sidecar
    // marking exactly the matched window and zero files rewritten; the
    // optimize fold is data-invariant
    "mor3_merge_on_read_upsert" ->
      """WITH win AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |merged AS (
        |  SELECT ts,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-21 00:00:00'
        |      THEN value + 1000 ELSE value END AS value
        |  FROM events
        |  UNION ALL SELECT ts, value FROM win)
        |SELECT CAST(count(*) AS BIGINT) AS n_v2,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value_v2,
        |  (SELECT CAST(2 * count(*) AS BIGINT) FROM win) AS n_window_v2,
        |  CAST(count(*) AS BIGINT) AS n_v3,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value_v3,
        |  (SELECT CAST(count(*) AS BIGINT) FROM win) AS n_dv_positions,
        |  TRUE AS zero_rewrites,
        |  TRUE AS dv_present,
        |  TRUE AS dv_folded
        |FROM merged""".stripMargin,

    // bf2: same closed-form key set as bf1; the manifest's row counts
    // must sum to the exact table count (they ride the build pass)
    "bf2_distributed_bloom" ->
      """WITH ks AS (
        |  SELECT min(event_id) AS k FROM events
        |  UNION SELECT max(event_id) FROM events
        |  UNION SELECT min(event_id) FROM events
        |    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-13 00:00:00')
        |SELECT CAST(count(*) AS BIGINT) AS n_hits,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS hit_value,
        |  CAST(16 AS BIGINT) AS files_total,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events)
        |    AS manifest_rows_total,
        |  TRUE AS no_false_negative,
        |  TRUE AS bloom_prunes,
        |  TRUE AS scan_within_selection
        |FROM events
        |WHERE event_id IN (SELECT k FROM ks)""".stripMargin,

    // mf4: the snapshot metadata answers must equal the data truth of
    // the mc1 closed form (events + 5× the appended day − the window);
    // min/max ts are unmoved by the append (inside events' range) and
    // the delete (window is interior)
    "mf4_snapshot_metadata_agg" ->
      """WITH d26 AS (
        |  SELECT ts FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-26 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-27 00:00:00'),
        |allr AS (
        |  SELECT ts FROM events
        |  UNION ALL SELECT ts FROM d26 UNION ALL SELECT ts FROM d26
        |  UNION ALL SELECT ts FROM d26 UNION ALL SELECT ts FROM d26
        |  UNION ALL SELECT ts FROM d26),
        |final AS (
        |  SELECT * FROM allr
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00'))
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS min_ts_micros,
        |  CAST(epoch_us(max(ts)) AS BIGINT) AS max_ts_micros,
        |  TRUE AS metadata_only
        |FROM final""".stripMargin,

    // mc2: the pqsec table's closed form — events plus THREE copies of
    // the appended 2024-01-26 day minus the deleted window, read AFTER
    // the vacuum; externalization/replay/reclaim laws engine-verified
    "mc2_parquet_checkpoint" ->
      """WITH d26 AS (
        |  SELECT ts, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-26 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-27 00:00:00'),
        |allr AS (
        |  SELECT ts, value FROM events
        |  UNION ALL SELECT ts, value FROM d26
        |  UNION ALL SELECT ts, value FROM d26
        |  UNION ALL SELECT ts, value FROM d26),
        |final AS (
        |  SELECT * FROM allr
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00'))
        |SELECT CAST(count(*) AS BIGINT) AS n_final,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(5 AS BIGINT) AS n_versions,
        |  TRUE AS pqsec_externalized,
        |  TRUE AS replay_matches,
        |  TRUE AS vacuum_reclaims
        |FROM final""".stripMargin,

    // pp8: the string-range slice must equal the derived-key twin
    // (ids 100..199 through 26-char keys truncated past the 16-byte
    // stats budget); the pruning laws are engine-verified booleans
    "pp8_string_zone_read" ->
      """WITH d AS (
        |  SELECT 'doc' || lpad(CAST(doc_id AS VARCHAR), 10, '0')
        |    || '_xxxxxxxxxxxx' AS skey, n_chars
        |  FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_in_range,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_in_range,
        |  TRUE AS truncated_bounds,
        |  TRUE AS strict_subset,
        |  TRUE AS scan_within_selection,
        |  TRUE AS plan_footer_free
        |FROM d
        |WHERE skey >= 'doc0000000100' AND skey < 'doc0000000200'""".stripMargin,

    // sql1: the DSv2 day slice of the MoR-merged v2 = the window
    // re-imaged (+1000) plus the shadow inserts, originals retracted;
    // pushdown/audit laws are engine-verified booleans
    "sql1_dsv2_pushdown_read" ->
      """WITH win AS (
        |  SELECT ts, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |v2day AS (
        |  SELECT ts, value + 1000 AS value FROM win
        |  UNION ALL SELECT ts, value FROM win)
        |SELECT CAST(count(*) AS BIGINT) AS n_day,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS day_value,
        |  TRUE AS planner_pruned,
        |  TRUE AS scan_within_selection,
        |  TRUE AS strict_subset
        |FROM v2day""".stripMargin,

    // wr1: evens init + odds DSv2-appended = events exactly; the middle
    // id-quartile range twin proves the pruned read stays row-exact;
    // write/stats/pruning laws are engine-verified booleans
    "wr1_dsv2_write" ->
      """WITH n AS (
        |  SELECT min(event_id) AS mn,
        |    max(event_id) - min(event_id) + 1 AS span FROM events),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |      AS DOUBLE) / 1e6 AS total_value
        |  FROM events),
        |r AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_range,
        |    COALESCE(CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |      AS DOUBLE) / 1e6, 0.0) AS range_value
        |  FROM events
        |  WHERE event_id >= (SELECT mn + span // 4 FROM n)
        |    AND event_id < (SELECT mn + span // 2 FROM n))
        |SELECT a.n_total, a.total_value, r.n_range, r.range_value,
        |  TRUE AS stats_complete,
        |  TRUE AS zones_disjoint,
        |  TRUE AS plan_footer_free,
        |  TRUE AS planner_pruned,
        |  TRUE AS scan_within_plan
        |FROM a, r""".stripMargin,

    // ss3: the replicated destination must equal events exactly —
    // seed slice + two streamed epochs, no drop, no double commit;
    // exactly-once/replay/stats laws are engine-verified booleans
    "ss3_dsv2_stream_sink" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  TRUE AS batches_exactly_once,
        |  TRUE AS replay_skipped,
        |  TRUE AS stream_stats_complete
        |FROM events""".stripMargin,

    // sql2: the catalog-managed table must equal events exactly —
    // totals/extremes/mass plus the half (VERSION AS OF 2) and quartile
    // (pruned WHERE) slices; catalog/pushdown laws engine-verified
    "sql2_catalog_sql" ->
      """WITH n AS (SELECT count(*) AS c FROM events),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(min(event_id) AS BIGINT) AS min_id,
        |    CAST(max(event_id) AS BIGINT) AS max_id,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |      AS DOUBLE) / 1e6 AS total_value
        |  FROM events),
        |h AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_first_half FROM events
        |  WHERE event_id < (SELECT c // 2 FROM n)),
        |r AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_range FROM events
        |  WHERE event_id >= (SELECT c // 4 FROM n)
        |    AND event_id < (SELECT c // 2 FROM n))
        |SELECT a.n_total, a.min_id, a.max_id, a.total_value,
        |  h.n_first_half, r.n_range,
        |  TRUE AS agg_metadata_only,
        |  TRUE AS ts_travel_matches,
        |  TRUE AS scan_pruned
        |FROM a, h, r""".stripMargin,

    // sql3: optimize/zorder/vacuum must be data-invariant — the
    // maintained table still equals events exactly; procedure laws
    // engine-verified
    "sql3_sql_maintenance" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  TRUE AS optimize_compacted,
        |  TRUE AS data_invariant,
        |  TRUE AS zorder_two_dim_stats,
        |  TRUE AS vacuum_reclaimed,
        |  TRUE AS history_trimmed
        |FROM events""".stripMargin,

    // sql4: after DELETE of the second span-quartile the table is the
    // closed-form complement; the three-tier plan laws (metadata drop,
    // exact probe, COW-twin equality, time travel) engine-verified
    "sql4_sql_delete" ->
      """WITH n AS (
        |  SELECT min(event_id) AS mn,
        |    max(event_id) - min(event_id) + 1 AS span FROM events),
        |d AS (
        |  SELECT * FROM events
        |  WHERE event_id < (SELECT mn + span // 4 FROM n)
        |     OR event_id >= (SELECT mn + span // 2 FROM n))
        |SELECT CAST(count(*) AS BIGINT) AS n_after,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS after_value,
        |  TRUE AS covered_dropped,
        |  TRUE AS straddle_probed,
        |  TRUE AS marks_exact,
        |  TRUE AS matches_cow_twin,
        |  TRUE AS history_intact
        |FROM d""".stripMargin,

    // sql5: after MERGE the table is events with the day window
    // re-imaged (+1000) plus its shadow inserts (+5000); delta-plan
    // laws (zero rewrites, exact marks, MoR twin, travel) engine-
    // verified
    "sql5_sql_merge" ->
      """WITH win AS (
        |  SELECT value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |rest AS (
        |  SELECT value FROM events
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00')),
        |after AS (
        |  SELECT value + 1000 AS value FROM win
        |  UNION ALL SELECT value FROM rest
        |  UNION ALL SELECT value + 5000 AS value FROM win)
        |SELECT CAST(count(*) AS BIGINT) AS n_after,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS after_value,
        |  TRUE AS one_commit,
        |  TRUE AS zero_rewrites,
        |  TRUE AS marks_exact,
        |  TRUE AS matches_mor_twin,
        |  TRUE AS history_intact
        |FROM after""".stripMargin,

    // sql6: after UPDATE (+1 on the day window) the count is invariant
    // and the mass shifts by exactly the window row count; delta-plan
    // laws engine-verified
    "sql6_sql_update" ->
      """WITH after AS (
        |  SELECT CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'
        |    THEN value + 1 ELSE value END AS value
        |  FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_after,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS after_value,
        |  TRUE AS zero_rewrites,
        |  TRUE AS marks_exact,
        |  TRUE AS count_invariant,
        |  TRUE AS history_intact
        |FROM after""".stripMargin,

    // sql7: the v1→v2 feed of the MERGE is one preimage (original
    // value) + one postimage (+1000) per window key plus the shadow
    // inserts (+5000), zero deletes; the view-registration law is an
    // engine-verified boolean
    "sql7_cdc_catalog" ->
      """WITH win AS (
        |  SELECT value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00')
        |SELECT CAST(count(*) AS BIGINT) AS n_insert,
        |  CAST(count(*) AS BIGINT) AS n_update_pre,
        |  CAST(count(*) AS BIGINT) AS n_update_post,
        |  CAST(0 AS BIGINT) AS n_delete,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS pre_value,
        |  CAST(SUM(CAST(floor((value + 1000) * 1e6 + 0.5) AS HUGEINT))
        |    AS DOUBLE) / 1e6 AS post_value,
        |  CAST(SUM(CAST(floor((value + 5000) * 1e6 + 0.5) AS HUGEINT))
        |    AS DOUBLE) / 1e6 AS insert_value,
        |  TRUE AS view_registered
        |FROM win""".stripMargin,

    // mf5: count(*)/count(col) over the null-injected image — the
    // metadata-only-plan law is an engine-verified boolean
    "mf5_count_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(count(event_id) AS BIGINT) AS n_id,
        |  CAST(count(CASE WHEN event_id % 5 = 0 THEN NULL
        |    ELSE value END) AS BIGINT) AS n_v,
        |  TRUE AS metadata_only
        |FROM events""".stripMargin,

    // arr1: after deleting the top half of the id space, the embedding
    // table is the closed-form bottom half; nested decode fidelity and
    // the metadata-drop law are engine-verified booleans
    "arr1_dsv2_array_read" ->
      """WITH n AS (
        |  SELECT (min(vec_id) + max(vec_id) + 1) // 2 AS mid
        |  FROM embeddings),
        |d AS (
        |  SELECT * FROM embeddings
        |  WHERE vec_id < (SELECT mid FROM n))
        |SELECT CAST(count(*) AS BIGINT) AS n_after,
        |  CAST(sum(len(embedding)) AS BIGINT) AS len_after,
        |  CAST(SUM(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5)
        |    AS HUGEINT)) AS DOUBLE) / 1e6 AS c1_mass_after,
        |  TRUE AS full_read_matches,
        |  TRUE AS metadata_dropped
        |FROM d""".stripMargin,

    // rf1: the broadcast join's 3 surviving dim keys (every n/100th id,
    // labels 26-28) must match exactly those events rows; runtime-
    // filtering laws engine-verified
    "rf1_runtime_file_skip" ->
      """WITH n AS (SELECT count(*) AS c FROM events),
        |keys AS (
        |  SELECT i * (SELECT c // 100 FROM n) AS k
        |  FROM (VALUES (26), (27), (28)) t(i))
        |SELECT CAST(count(*) AS BIGINT) AS n_match,
        |  COALESCE(CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |    AS DOUBLE) / 1e6, 0.0) AS matched_value,
        |  TRUE AS runtime_filter_planned,
        |  TRUE AS files_skipped
        |FROM events WHERE event_id IN (SELECT k FROM keys)""".stripMargin,

    // pp6: the zone-pruned day slice must equal the flat events twin
    // (the appended 01-26 copies and the deleted window cannot leak in);
    // the selection laws are engine-verified booleans
    "pp6_snapshot_zone_read" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_day,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS day_value,
        |  TRUE AS strict_subset,
        |  TRUE AS scan_within_selection,
        |  TRUE AS plan_footer_free
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-21 00:00:00'""".stripMargin,

    // vc1: the kept version = events + the appended 01-25 day − the
    // deleted window; retention/reclaim laws are engine-verified
    "vc1_vacuum_retention" ->
      """WITH d25 AS (
        |  SELECT ts, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-26 00:00:00'),
        |final AS (
        |  SELECT * FROM (
        |    SELECT ts, value FROM events
        |    UNION ALL SELECT ts, value FROM d25)
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00'))
        |SELECT CAST(count(*) AS BIGINT) AS n_final,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(4 AS BIGINT) AS latest_version,
        |  CAST(4 AS BIGINT) AS n_live_files,
        |  TRUE AS history_dropped,
        |  TRUE AS storage_reclaimed_exactly
        |FROM final""".stripMargin,

    // hist1: per-version row counts recomputed from the DATA's closed
    // form (v1 = events; +|day 26| per append through v6, v4 being the
    // full checkpoint; v7 = −|window|); stamps engine-verified
    "hist1_describe_history" ->
      """WITH n AS (
        |  SELECT
        |    (SELECT count(*) FROM events) AS ev,
        |    (SELECT count(*) FROM events
        |     WHERE ts >= TIMESTAMP '2024-01-26 00:00:00'
        |       AND ts < TIMESTAMP '2024-01-27 00:00:00') AS d26,
        |    (SELECT count(*) FROM events
        |     WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |       AND ts < TIMESTAMP '2024-01-13 00:00:00') AS win)
        |SELECT CAST(v AS INT) AS version,
        |  CAST(CASE WHEN v <= 6 THEN ev + (v - 1) * d26
        |       ELSE ev + 5 * d26 - win END AS BIGINT) AS n_rows,
        |  (v NOT IN (1, 4)) AS is_delta,
        |  TRUE AS all_stamped
        |FROM n, (VALUES (1), (2), (3), (4), (5), (6), (7)) AS t(v)
        |ORDER BY version""".stripMargin,

    // bf3: the closed-form key set over the MUTATED table — min/max id
    // of (events − window) ∪ (day-25 + 6e12), plus the deleted window's
    // min id which must hit NOTHING; selection laws engine-verified
    "bf3_snapshot_point_lookup" ->
      """WITH d25 AS (
        |  SELECT event_id + 6000000000000 AS event_id, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-26 00:00:00'),
        |fin AS (
        |  SELECT event_id, value FROM events
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00')
        |  UNION ALL SELECT event_id, value FROM d25),
        |ks AS (
        |  SELECT min(event_id) AS k FROM fin
        |  UNION SELECT max(event_id) FROM fin
        |  UNION SELECT min(event_id) FROM events
        |    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-13 00:00:00')
        |SELECT CAST(count(*) AS BIGINT) AS n_hits,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS hit_value,
        |  CAST(4 AS BIGINT) AS files_total,
        |  TRUE AS no_false_negative,
        |  TRUE AS bloom_prunes,
        |  TRUE AS scan_within_selection
        |FROM fin
        |WHERE event_id IN (SELECT k FROM ks)""".stripMargin,

    // pp7: the conjunctively-pruned snapshot read must equal the flat
    // twin (mf3's predicate on the versioned table); selection laws are
    // engine-verified booleans
    "pp7_snapshot_zorder_read" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(16 AS BIGINT) AS files_total,
        |  TRUE AS no_false_negative,
        |  TRUE AS strict_subset,
        |  TRUE AS scan_within_selection,
        |  TRUE AS plan_footer_free
        |FROM events
        |WHERE user_id < 8
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'""".stripMargin,

    // q19: one equi-join, the disjunction as a filter
    "q19_disjunctive_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e6
        |    + 0.5) AS HUGEINT)) AS DOUBLE) / 1e6 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 20)
        |  OR (p_type = 'STANDARD' AND p_size BETWEEN 10 AND 30
        |    AND l_quantity BETWEEN 10 AND 35)
        |  OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity BETWEEN 20 AND 50)""".stripMargin,

    // c16: cross-table temporal consistency, exact counts + 6dp rate
    "c16_temporal_audit" ->
      """SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_violations,
        |  floor(CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
        |    AS violation_rate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    // q13: LEFT JOIN with the join-level filter, double aggregation
    "q13_custdist" ->
      """WITH pc AS (SELECT c_custkey,
        |    CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // q15: HUGEINT-exact revenue view, exact-integer max tie-keep
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e6 + 0.5)
        |      AS HUGEINT)) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) / 1e6 AS total_revenue
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE r = (SELECT max(r) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    // q22: scalar-subquery average (quantized), anti-join, grouped finish
    "q22_sleeping_customers" ->
      """WITH a AS (SELECT floor(
        |    CAST(SUM(CAST(floor(c_acctbal * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |      / count(*) / 1e6 * 1e6 + 0.5) / 1e6 AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT CAST(c_custkey % 100 AS BIGINT) AS cntry,
        |  CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(floor(c_acctbal * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS totacctbal
        |FROM customer, a
        |WHERE floor(c_acctbal * 1e6 + 0.5) > floor(avg_bal * 1e6 + 0.5)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY cntry
        |ORDER BY cntry""".stripMargin,

    // w9: DuckDB's native forward ASOF (strict <) against the same
    // deduped right side
    "w9_next_order" ->
      """WITH od AS (SELECT o_custkey, o_orderdate,
        |    max(o_orderkey) AS r_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT o.o_orderkey, o.o_custkey,
        |  od.r_orderkey AS next_orderkey,
        |  CAST(datediff('day', CAST(o.o_orderdate AS DATE),
        |    CAST(od.o_orderdate AS DATE)) AS BIGINT) AS gap_days
        |FROM orders o ASOF LEFT JOIN od
        |  ON o.o_custkey = od.o_custkey AND o.o_orderdate < od.o_orderdate
        |ORDER BY o.o_orderkey""".stripMargin,

    // ts3: the ab1 sufficient-sums chain per (type, hour) + the quantized
    // 3-sigma anomaly count, zero-filled
    "ts3_seasonal_baseline" ->
      """WITH e AS (SELECT event_type,
        |    CAST(hour(ts) AS BIGINT) AS hod, value,
        |    CAST(floor(value * 1e6 + 0.5) AS HUGEINT) AS q
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(SUM(q) AS DOUBLE) AS s, CAST(SUM(q * q) AS DOUBLE) AS ss
        |  FROM e GROUP BY event_type, hod),
        |b AS (SELECT event_type, hod, n_events,
        |    floor(s / n_events / 1e6 * 1e6 + 0.5) / 1e6 AS mean_value,
        |    floor(sqrt(CASE WHEN n_events >= 2 THEN
        |        (n_events * ss - s * s) /
        |        (CAST(n_events AS DOUBLE) * (n_events - 1.0)) / 1e12
        |      ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS std_value
        |  FROM g),
        |a AS (SELECT e.event_type, e.hod, count(*) AS n_anomalies
        |  FROM e JOIN b ON e.event_type = b.event_type AND e.hod = b.hod
        |  WHERE floor(abs(e.value - b.mean_value) * 1e6 + 0.5) >
        |        floor(b.std_value * 3.0 * 1e6 + 0.5)
        |  GROUP BY e.event_type, e.hod)
        |SELECT b.event_type, b.hod, b.n_events, b.mean_value, b.std_value,
        |  CAST(COALESCE(a.n_anomalies, 0) AS BIGINT) AS n_anomalies
        |FROM b LEFT JOIN a ON b.event_type = a.event_type AND b.hod = a.hod
        |ORDER BY b.event_type, b.hod""".stripMargin,

    // t10: the same planted control bytes built with chr(), the same
    // class stripped (RE2 reads the \x escapes itself)
    "t10_control_scrub" ->
      """WITH p AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN chr(1) || 'x' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN chr(7) || chr(127) ELSE '' END
        |    AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(raw) - length(regexp_replace(raw,
        |    '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')) AS BIGINT)
        |    AS n_ctrl,
        |  regexp_replace(raw, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')
        |    AS clean_text
        |FROM p
        |ORDER BY doc_id""".stripMargin,

    // dq2: one grouped aggregate, verdict folded to a boolean
    "dq2_fd_audit" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  count(DISTINCT source) <= 1 AS fd_holds
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // sj1: the PLAIN join — the salted rewrite must reproduce exactly
    // this relation
    "sj1_salted_join" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(floor(l_quantity * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_qty
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    // hh1: deterministic total order (count desc, key) before the LIMIT
    "hh1_heavy_hitters" ->
      """WITH f AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY l_partkey),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM lineitem)
        |SELECT l_partkey, cnt,
        |  floor(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS share
        |FROM f, t
        |ORDER BY cnt DESC, l_partkey
        |LIMIT 20""".stripMargin,

    // th1: exact segment algebra from one grouped pass; the two sketch
    // gates pinned TRUE — exact-regime theta (nominal 4096 » user
    // domain) retains every hash, so estimates are exact and
    // sharding-independent (witnessed in-row by isEstimationMode)
    "th1_theta_segments" ->
      """WITH f AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
        |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS s
        |  FROM events GROUP BY user_id)
        |SELECT CAST(SUM(c) AS BIGINT) AS n_click_users,
        |  CAST(SUM(s) AS BIGINT) AS n_signup_users,
        |  CAST(SUM(CASE WHEN c = 1 OR s = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_any_users,
        |  CAST(SUM(CASE WHEN c = 1 AND s = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_both_users,
        |  CAST(SUM(CASE WHEN c = 1 AND s = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_click_only_users,
        |  TRUE AS sketch_exact_mode,
        |  TRUE AS sketch_matches_exact
        |FROM f""".stripMargin,

    // hh2: exact anchors (totals, top-1 href) recomputed from the h2
    // href replay; the three sketch gates pinned TRUE — each is a
    // Misra-Gries theorem for any sharding/merge order (see Queries
    // scaladoc), the p11c convention applied to frequent items
    "hh2_sketch_heavy_hitters" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</title><style>p{margin:0}</style><script>var id=' ||
        |  CAST(doc_id AS VARCHAR) || ';</script></head><body>' ||
        |  '<div><a href="/">Home</a> <a href="/about">About</a> nav</div>' ||
        |  '<p>' || text || '</p>' ||
        |  '<!-- hidden ' || CAST(doc_id AS VARCHAR) || ' -->' ||
        |  CASE WHEN doc_id % 3 = 0 THEN '<ul><li><a href="/x">x' ||
        |    CAST(doc_id AS VARCHAR) || '</a></li></ul>' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN
        |    '<p>terms &amp; conditions &quot;apply&quot; &lt;here&gt; &#39;now&#39;&nbsp;always</p>'
        |    ELSE '' END ||
        |  '<p>as noted in <a href="/ref' || CAST(doc_id AS VARCHAR) ||
        |  '">reference ' || CAST(doc_id AS VARCHAR) ||
        |  '</a> the corpus continues</p>' ||
        |  '<div>copyright <a href="/c">contact</a> <a href="/p">privacy</a> <a href="/t">terms</a></div>' ||
        |  '</body></html>' AS html
        |  FROM documents),
        |links AS (SELECT doc_id,
        |    unnest(list_concat(
        |      regexp_extract_all(html, '(?i)<a[ \t\n\r][^>]*href="([^"]*)"', 1),
        |      regexp_extract_all(html, '(?i)<a[ \t\n\r][^>]*href=''([^'']*)''', 1)))
        |      AS href
        |  FROM h),
        |top1 AS (SELECT href AS top_href, CAST(count(*) AS BIGINT)
        |    AS top_href_refs
        |  FROM links GROUP BY href ORDER BY top_href_refs DESC, top_href
        |  LIMIT 1)
        |SELECT CAST(count(*) AS BIGINT) AS total_refs,
        |  CAST(count(DISTINCT href) AS BIGINT) AS distinct_hrefs,
        |  top1.top_href, top1.top_href_refs,
        |  TRUE AS true_top5_covered,
        |  TRUE AS bounds_hold,
        |  TRUE AS sketch_lossy
        |FROM links, top1
        |GROUP BY top1.top_href, top1.top_href_refs""".stripMargin,

    // lp1: the planted reference plan /ref{doc_id % 97} makes residue
    // classes the ground-truth communities, so converged min-label
    // propagation has the closed form min(doc_id) per residue — the
    // oracle replays THAT; the iterative machinery itself is
    // convergence-witnessed in-engine and spec-proven in GraphSpec
    "lp1_link_communities" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS community,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc,
        |  CAST(max(doc_id) AS BIGINT) AS max_doc
        |FROM documents
        |GROUP BY doc_id % 97
        |ORDER BY community""".stripMargin,

    // zipf1: 6dp-quantized log coordinates, HUGEINT-exact OLS moments,
    // one double finish — the regression face of the exact-sum contract
    "zipf1_zipf_slope" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+'))
        |    AS term FROM documents),
        |f AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
        |  FROM tok GROUP BY term),
        |r AS (SELECT freq,
        |    row_number() OVER (ORDER BY freq DESC, term) AS rank
        |  FROM f),
        |xy AS (SELECT
        |    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
        |  FROM r WHERE rank <= 100),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        |  FROM xy)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |  floor(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS zipf_slope
        |FROM m""".stripMargin,

    // p11d: exact + both gates TRUE (reload invariance is the claim; the
    // sketch bytes round-trip parquet binary unchanged)
    "p11d_durable_sketch_merge" ->
      """SELECT count(DISTINCT o_custkey) AS exact_custkeys,
        |  TRUE AS reload_within_5pct,
        |  TRUE AS reload_invariant
        |FROM orders""".stripMargin,

    // p11e: exact anchor + gates TRUE — replay idempotence is an HLL
    // union theorem (duplicate partials are no-ops), 8 staged files = 8
    // micro-batches by construction, estimate within 5% of exact;
    // cross-grouping estimate equality deliberately NOT gated (batch-cut
    // partials overlap keys — see Queries scaladoc)
    "p11e_streaming_sketch_index" ->
      """SELECT count(DISTINCT o_custkey) AS exact_custkeys,
        |  CAST(8 AS BIGINT) AS n_batches,
        |  TRUE AS stream_within_5pct,
        |  TRUE AS replay_invariant
        |FROM orders""".stripMargin,

    // mm6: the planted perceptual-dup truth in closed form — slope class
    // doc_id % 23 decides the raster's structure, the brightness offset
    // is hash-invisible (within-class Hamming <= 4 < radius 7 <
    // cross-class >= 14, probed over all 69 distinct rasters), so the
    // engine's decode->dHash->banded-join pipeline must find exactly
    // every within-class pair: C(n_c, 2) per residue class
    "mm6_dhash_neardup" ->
      """SELECT CAST(doc_id % 23 AS BIGINT) AS img_class,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_pairs
        |FROM documents
        |GROUP BY doc_id % 23
        |ORDER BY img_class""".stripMargin,

    // mm7: planted sawtooth-rotation classes — within-class pairs only
    // (cross-class Hamming is exactly 16 by construction, outside the
    // radius-7 verify)
    "mm7_audio_neardup" ->
      """SELECT CAST(doc_id % 8 AS BIGINT) AS audio_class,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_pairs
        |FROM documents
        |GROUP BY doc_id % 8
        |ORDER BY audio_class""".stripMargin,

    // kll1: exact anchors (count, 6dp min/max) + six gates pinned TRUE —
    // each a deterministic KLL theorem (exact n/min/max, in-stream
    // quantiles, rank monotonicity, lossy witness) except the rank
    // bound, gated at 2x the published 99%-confidence eps(k) (a ~5-sigma
    // event to breach) — the hh2/p11c honesty convention for randomized
    // sketches
    "kll1_quantile_sketch" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_values,
        |  floor(min(value) * 1e6 + 0.5) / 1e6 AS min_value,
        |  floor(max(value) * 1e6 + 0.5) / 1e6 AS max_value,
        |  TRUE AS sketch_n_exact,
        |  TRUE AS sketch_minmax_exact,
        |  TRUE AS rank_bounds_hold,
        |  TRUE AS quantiles_in_stream,
        |  TRUE AS quantiles_monotone,
        |  TRUE AS sketch_lossy
        |FROM events WHERE value IS NOT NULL""".stripMargin,

    // kll2: per-group exact anchors + the kll1 theorem gates per group
    "kll2_grouped_quantiles" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_values,
        |  floor(min(value) * 1e6 + 0.5) / 1e6 AS min_value,
        |  floor(max(value) * 1e6 + 0.5) / 1e6 AS max_value,
        |  TRUE AS sketch_n_exact,
        |  TRUE AS sketch_minmax_exact,
        |  TRUE AS rank_bounds_hold,
        |  TRUE AS quantiles_in_stream,
        |  TRUE AS quantiles_monotone
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // rs1/vo1: sampled sets are random — the oracle pins the exact
    // anchors and the theorem gates (all TRUE by the reservoir/VarOpt
    // guarantees; see Queries.rs1ReservoirSample/vo1VaroptSample)
    "rs1_reservoir_sample" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |  (SELECT CAST(count(*) AS BIGINT) FROM nation) AS n_nation,
        |  TRUE AS sketch_n_exact,
        |  TRUE AS shard_invariant_n,
        |  TRUE AS sample_size_min_n_k,
        |  TRUE AS samples_in_stream,
        |  TRUE AS sample_distinct,
        |  TRUE AS exact_regime_match
        |FROM orders""".stripMargin,

    "vo1_varopt_sample" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lineitem,
        |  (SELECT CAST(count(*) AS BIGINT) FROM nation) AS n_nation,
        |  CAST(SUM(CAST(floor(l_quantity * 1e6 + 0.5) AS HUGEINT))
        |    AS DOUBLE) / 1e6 AS total_quantity,
        |  TRUE AS sketch_n_exact,
        |  TRUE AS shard_invariant_n,
        |  TRUE AS sample_size_min_n_k,
        |  TRUE AS samples_in_stream,
        |  TRUE AS weight_sum_invariant,
        |  TRUE AS exact_regime_match
        |FROM lineitem""".stripMargin,

    // cf1: file counts pinned by construction (64-way fragmented ingest
    // fixture, compaction target 4); data truth pinned vs flat events
    // (the pp1 re-layout losslessness convention)
    "cf1_small_file_compaction" ->
      """SELECT CAST(64 AS BIGINT) AS files_before,
        |  CAST(4 AS BIGINT) AS files_after,
        |  TRUE AS compaction_reduced,
        |  TRUE AS file_ranges_disjoint,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_event_ids,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value
        |FROM events""".stripMargin,

    // mf1: manifest-planned window scan — values are the pp2 flat-twin
    // window shape; file counts pinned by the cf1 fixture construction
    "mf1_manifest_pruning" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(4 AS BIGINT) AS files_total,
        |  TRUE AS manifest_strict_subset,
        |  TRUE AS scan_within_selection,
        |  TRUE AS manifest_complete
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'""".stripMargin,

    // mf2: the oracle computes from DATA what the engine answered from
    // METADATA alone — the hash match is the whole claim
    "mf2_metadata_only_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS min_ts_micros,
        |  CAST(epoch_us(max(ts)) AS BIGINT) AS max_ts_micros
        |FROM events""".stripMargin,

    // lc1: closed-form replay of the whole lifecycle — bump the 01-20
    // day, add its shadow inserts, add the evolved 01-25 append, strip
    // the deleted 01-10..13 window; optimize is data-invariant
    "lc1_lakehouse_lifecycle" ->
      """WITH d20 AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |d25 AS (
        |  SELECT ts, value, floor(value * 0.5 * 1e6 + 0.5) / 1e6 AS qs
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-26 00:00:00'),
        |merged AS (
        |  SELECT ts,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-21 00:00:00'
        |      THEN value + 1000 ELSE value END AS value,
        |    CAST(NULL AS DOUBLE) AS qs
        |  FROM events
        |  UNION ALL SELECT ts, value, CAST(NULL AS DOUBLE) FROM d20
        |  UNION ALL SELECT ts, value, qs FROM d25),
        |final AS (
        |  SELECT * FROM merged
        |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-13 00:00:00'))
        |SELECT CAST(count(*) AS BIGINT) AS n_final,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(SUM(CAST(floor(qs * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_quality,
        |  CAST(SUM(CASE WHEN qs IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_quality,
        |  CAST(5 AS BIGINT) AS n_versions,
        |  CAST(4 AS BIGINT) AS files_final
        |FROM final""".stripMargin,

    // tt1: time travel — v1 is the whole table, v2 is the table minus
    // the deleted window, zero window rows survive in v2
    "tt1_snapshot_delete" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_v1,
        |  (SELECT CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |     AS DOUBLE) / 1e6 FROM events) AS total_value_v1,
        |  CAST(count(*) AS BIGINT) AS n_v2,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value_v2,
        |  CAST(0 AS BIGINT) AS n_window_v2,
        |  CAST(4 AS BIGINT) AS files_v1,
        |  TRUE AS copy_on_write_bounded
        |FROM events
        |WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00')""".stripMargin,

    // cdc1: the net-removed feed of the tt1 delete IS the deleted
    // window; net-added is empty
    "cdc1_change_feed" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_removed,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS removed_value,
        |  CAST(0 AS BIGINT) AS n_added_net
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'""".stripMargin,

    // up1: closed-form MERGE replay — events with the 2024-01-20 window
    // bumped +1000, UNION ALL one shadow insert per window row
    "up1_snapshot_upsert" ->
      """WITH win AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |merged AS (
        |  SELECT ts,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-21 00:00:00'
        |      THEN value + 1000 ELSE value END AS value
        |  FROM events
        |  UNION ALL SELECT ts, value FROM win)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_v1,
        |  CAST(count(*) AS BIGINT) AS n_latest,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value_latest,
        |  (SELECT CAST(2 * count(*) AS BIGINT) FROM win)
        |    AS n_window_latest,
        |  CAST(4 AS BIGINT) AS files_v1,
        |  TRUE AS upsert_cow_bounded
        |FROM merged""".stripMargin,

    // se1: evolved-table replay — events (quality_score NULL) UNION ALL
    // the appended 2024-01-25 day carrying the new column
    "se1_schema_evolution" ->
      """WITH day AS (
        |  SELECT value, floor(value * 0.5 * 1e6 + 0.5) / 1e6 AS qs
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-26 00:00:00'),
        |evolved AS (
        |  SELECT value, CAST(NULL AS DOUBLE) AS qs FROM events
        |  UNION ALL SELECT value, qs FROM day)
        |SELECT CAST(count(*) AS BIGINT) AS n_latest,
        |  CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_value,
        |  CAST(SUM(CAST(floor(qs * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_quality,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events)
        |    + (SELECT CAST(count(*) AS BIGINT) FROM day WHERE qs IS NULL)
        |    AS n_null_quality
        |FROM evolved""".stripMargin,

    // ap1: the streamed table is original ∪ id-offset copy; 1 + 8
    // versions, 8 exactly-once batch markers
    "ap1_stream_ingest" ->
      """SELECT CAST(2 * count(*) AS BIGINT) AS n_latest,
        |  CAST(2 * SUM(CAST(floor(value * 1e6 + 0.5) AS HUGEINT))
        |    AS DOUBLE) / 1e6 AS total_value,
        |  CAST(9 AS BIGINT) AS n_versions,
        |  CAST(8 AS BIGINT) AS n_batches
        |FROM events""".stripMargin,

    // q4: the EXISTS form verbatim — DuckDB plans it as a semi-join, the
    // same relation the Spark left_semi computes
    "q4_priority_exists" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // q7: HUGEINT-exact per-row-quantized volume, the house revenue chain
    "q7_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(floor(volume * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    l_extendedprice * (1.0 - l_discount) AS volume
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND ((n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12')
        |      OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    // q8: two exact sums, one published-value division, 6dp
    "q8_market_share" ->
      """WITH j AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    ns.n_name AS supp_nation,
        |    l_extendedprice * (1.0 - l_discount) AS volume
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation nc ON nc.n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = nc.n_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ns ON ns.n_nationkey = s_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'),
        |g AS (SELECT o_year,
        |    CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
        |        THEN CAST(floor(volume * 1e6 + 0.5) AS HUGEINT)
        |        ELSE CAST(0 AS HUGEINT) END) AS DOUBLE) / 1e6
        |      AS nation_volume,
        |    CAST(SUM(CAST(floor(volume * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |      / 1e6 AS total_volume
        |  FROM j GROUP BY o_year)
        |SELECT o_year, nation_volume, total_volume,
        |  CASE WHEN total_volume > 0.0
        |    THEN floor(nation_volume / total_volume * 1e6 + 0.5) / 1e6
        |    ELSE 0.0 END AS mkt_share
        |FROM g ORDER BY o_year""".stripMargin,

    // h2: the href regex replayed over the h1-planted HTML, unnested and
    // aggregated — the URL-frontier build
    "h2_link_graph" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</title><style>p{margin:0}</style><script>var id=' ||
        |  CAST(doc_id AS VARCHAR) || ';</script></head><body>' ||
        |  '<div><a href="/">Home</a> <a href="/about">About</a> nav</div>' ||
        |  '<p>' || text || '</p>' ||
        |  '<!-- hidden ' || CAST(doc_id AS VARCHAR) || ' -->' ||
        |  CASE WHEN doc_id % 3 = 0 THEN '<ul><li><a href="/x">x' ||
        |    CAST(doc_id AS VARCHAR) || '</a></li></ul>' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN
        |    '<p>terms &amp; conditions &quot;apply&quot; &lt;here&gt; &#39;now&#39;&nbsp;always</p>'
        |    ELSE '' END ||
        |  '<p>as noted in <a href="/ref' || CAST(doc_id AS VARCHAR) ||
        |  '">reference ' || CAST(doc_id AS VARCHAR) ||
        |  '</a> the corpus continues</p>' ||
        |  '<div>copyright <a href="/c">contact</a> <a href="/p">privacy</a> <a href="/t">terms</a></div>' ||
        |  '</body></html>' AS html
        |  FROM documents),
        |links AS (SELECT doc_id,
        |    unnest(list_concat(
        |      regexp_extract_all(html, '(?i)<a[ \t\n\r][^>]*href="([^"]*)"', 1),
        |      regexp_extract_all(html, '(?i)<a[ \t\n\r][^>]*href=''([^'']*)''', 1)))
        |      AS href
        |  FROM h)
        |SELECT href, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages,
        |  CAST(count(*) AS BIGINT) AS n_refs
        |FROM links GROUP BY href ORDER BY href""".stripMargin,

    // w8: ntile over a TOTAL order is deterministic in any engine
    "w8_ntile_bands" ->
      """WITH b AS (SELECT c_mktsegment, c_acctbal,
        |    CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
        |  FROM customer)
        |SELECT c_mktsegment, quartile,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
        |  CAST(SUM(CAST(floor(c_acctbal * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 1e6 AS total_bal
        |FROM b GROUP BY c_mktsegment, quartile
        |ORDER BY c_mktsegment, quartile""".stripMargin,

    // p11c: exact count + both gates pinned TRUE (the p11 convention;
    // shard-count invariance is additionally spec-proven at 2/4/16)
    "p11c_sharded_sketch_merge" ->
      """SELECT count(DISTINCT o_custkey) AS exact_custkeys,
        |  CAST(8 AS BIGINT) AS n_shards,
        |  TRUE AS merged_within_5pct,
        |  TRUE AS merge_shard_invariant
        |FROM orders""".stripMargin,

    // mm4: literal fixture truth recomputed from the SyntheticMedia
    // closed forms in plain Scala (not by decoding) — dims are the
    // requested raster, frames the requested PCM length, duration
    // frames*1000/8000, mean level the exact mean of the generating
    // signal (gradient (7x+13y)%256 / truncated 128+100*sin(0.1i)),
    // 6dp-quantized with the house floor
    "mm4_jvm_decode" -> {
      def q6d(x: Double): String =
        f"${math.floor(x * 1e6 + 0.5) / 1e6}%.6f"
      def pngMean(w: Int, h: Int): String = {
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { s += (x * 7 + y * 13) % 256; x += 1 }
          y += 1
        }
        q6d(s.toDouble / (w.toLong * h))
      }
      def wavMean(n: Int): String = {
        var s = 0L
        var i = 0
        while (i < n) {
          s += ((128 + 100 * math.sin(i * 0.1)).toByte & 0xff)
          i += 1
        }
        q6d(s.toDouble / n)
      }
      val rows =
        (1 to 3).map { i =>
          val (w, h) = (16 + i, 8 + i)
          s"($i, 'image/png', $w, $h, 1, 0, ${pngMean(w, h)})"
        } ++
        (4 to 6).map { i =>
          val n = 240 * (i - 3)
          s"($i, 'audio/wav', 0, 0, $n, ${n * 1000L / 8000}, ${wavMean(n)})"
        }
      s"""SELECT CAST(media_id AS BIGINT) AS media_id, mime,
         |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
         |  CAST(n_frames AS BIGINT) AS n_frames,
         |  CAST(duration_ms AS BIGINT) AS duration_ms,
         |  CAST(mean_level AS DOUBLE) AS mean_level
         |FROM (VALUES ${rows.mkString(",\n  ")})
         |  t(media_id, mime, width, height, n_frames, duration_ms, mean_level)
         |ORDER BY media_id""".stripMargin
    }
  )

  // mm5: literal measured truth of the two COMMITTED media fixtures
  // (src/main/resources/graft/media): 12x8 RGB PNG with per-pixel integer
  // luminance mean 126.385417; 333-frame 8-bit 11025 Hz PCM WAV, duration
  // 333*1000/11025 = 30 ms (integer), mean unsigned sample 130.900901.
  // Values measured at fixture-creation time from the generating pattern
  // and pinned as constants — the row breaks if the artifacts or the
  // codec seam drift.
  private val mm5Sql: (String, String) = "mm5_committed_media" ->
    """SELECT CAST(media_id AS BIGINT) AS media_id, mime,
      |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
      |  CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(duration_ms AS BIGINT) AS duration_ms,
      |  CAST(mean_level AS DOUBLE) AS mean_level
      |FROM (VALUES
      |  (1, 'image/png', 12, 8, 1, 0, 126.385417),
      |  (2, 'audio/wav', 0, 0, 333, 30, 130.900901))
      |  t(media_id, mime, width, height, n_frames, duration_ms, mean_level)
      |ORDER BY media_id""".stripMargin

  // The reloaded-index rows assert a save/load round-trip is invisible:
  // the engine probes an index persisted to parquet and loaded back in a
  // fresh handle, and the result must hash-match the SAME oracle replay
  // the in-session rows pin — so the oracle SQL is shared by reference.
  val sql: Map[String, String] = sql0 + mm5Sql ++ Map(
    "nd2r_reloaded_neardup" -> sql0("nd2_incremental_neardup"),
    "nd5r_reloaded_fuzzy" -> sql0("nd5_incremental_fuzzy"),
    "nd3r_reloaded_semdedup" -> sql0("nd3_incremental_semdedup"),
    "tok1r_reloaded_bpe" -> sql0("tok1_bpe_count"),
    "s6r_reloaded_pq" -> sql0("s6_pq_topk"),
    "bm25b_indexed" -> sql0("bm25_topk"),
    // incremental merge must equal the full recompaction bit-for-bit
    "scd1b_incremental_history" -> sql0("scd1_history"))
}
