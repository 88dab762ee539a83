package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface test for the GraftExtensions function registry. */
class ExtensionsSpec extends AnyFunSuite {

  test("custom kernels callable from spark.sql") {
    // Apply the extension's function registrations onto the SHARED test
    // session (the same `registerFunctions` path `withExtensions` runs at
    // session build) — a `builder().withExtensions(...).getOrCreate()` here
    // would silently NO-OP whenever another suite already created the
    // session, making the suite pass/fail on suite ordering.
    val spark = SparkTestSession.spark
    org.apache.spark.sql.GraftSqlBridge.registerFunctionExtensions(
      spark, new GraftExtensions)
    try {
      val r = spark.sql(
        """SELECT
          |  graft_vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
          |                array(cast(3.0 as float), cast(4.0 as float))) AS dot,
          |  graft_vec_norm(array(cast(3.0 as float), cast(4.0 as float))) AS nrm,
          |  graft_shingles('a b c', 2) AS sh,
          |  size(graft_minhash(graft_shingles('a b c d', 2), 16)) AS sig_len,
          |  graft_jaccard(array('a','b'), array('b','c')) AS jac,
          |  graft_simhash('hello world') AS sh64,
          |  graft_lsh_bucket(array(cast(1.0 as float), cast(-1.0 as float)), 4, 42) AS bkt,
          |  graft_langid('the and is of la le') AS lang,
          |  graft_langid(NULL) AS lang_null
          |""".stripMargin).head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 5.0)
      assert(r.getSeq[String](2) == Seq("a b", "b c"))
      assert(r.getInt(3) == 16)
      assert(math.abs(r.getDouble(4) - 1.0 / 3.0) < 1e-15)
      assert(r.getLong(6) >= 0 && r.getLong(6) < 16)
      assert(r.getString(7) == "en")
      assert(r.getString(8) == "und") // null text identifies as "und"
      val r2 = spark.sql(
        """SELECT
          |  graft_redact_pii('mail a@b.co or 10.1.2.3 or 555-1234') AS red,
          |  graft_extract_domain('see https://x.example.org/p') AS dom,
          |  graft_extract_domain('no url') AS dom_null,
          |  graft_fingerprint('A b, C!') = graft_fingerprint('abc') AS fp_eq,
          |  graft_token_count(' a  b c ') AS ntok
          |""".stripMargin).head()
      assert(r2.getString(0) == "mail <EMAIL> or <IP> or <PHONE>")
      assert(r2.getString(1) == "x.example.org")
      assert(r2.isNullAt(2))
      assert(r2.getBoolean(3))
      assert(r2.getInt(4) == 3)
      val r3 = spark.sql(
        """SELECT
          |  graft_bpe_count('window customer scan') AS nbpe,
          |  graft_bpe_tokens('customer') AS btoks
          |""".stripMargin).head()
      assert(r3.getLong(0) == 7L) // window=1, customer=5, scan=1
      assert(r3.getSeq[String](1).mkString == "customer")
      val r4 = spark.sql(
        """SELECT
          |  graft_vec_distsq(array(cast(1.0 as float), cast(2.0 as float)),
          |                   array(cast(4.0 as float), cast(6.0 as float))) AS d2,
          |  graft_block_argmin(array(cast(0.0 as double), cast(0.9 as double)),
          |    array(struct(7, array(cast(1.0 as double), cast(0.0 as double))),
          |          struct(3, array(cast(0.0 as double), cast(1.0 as double))))) AS am,
          |  graft_block_cosine_match(array(cast(1.0 as float), cast(0.0 as float)),
          |    array(struct(cast(11 as bigint),
          |                 array(cast(1.0 as float), cast(0.0 as float)),
          |                 cast(1.0 as double))), 0.99) AS cm,
          |  graft_block_cosine_match(array(cast(0.0 as float), cast(1.0 as float)),
          |    array(struct(cast(11 as bigint),
          |                 array(cast(1.0 as float), cast(0.0 as float)),
          |                 cast(1.0 as double))), 0.99) AS cm_null
          |""".stripMargin).head()
      assert(r4.getDouble(0) == 25.0)
      assert(r4.getStruct(1).getInt(1) == 3) // nearer centroid wins
      assert(r4.getStruct(2).getLong(0) == 11L && r4.getStruct(2).getLong(1) == 1L)
      assert(r4.isNullAt(3)) // below threshold -> NULL

      // sketch aggregates through pure SQL: shard -> partial -> merge ->
      // readout, exact regime end to end
      val r5 = spark.sql(
        """WITH src AS (SELECT id, concat('k', id % 7) AS v FROM range(0, 700)),
          |parts AS (SELECT id % 4 AS shard,
          |    graft_freq_sketch_agg(v, 64) AS fsk,
          |    graft_theta_sketch_agg(v, 4096) AS tsk
          |  FROM src GROUP BY id % 4),
          |m AS (SELECT graft_freq_sketch_merge(fsk, 64) AS fsk,
          |    graft_theta_union_agg(tsk, 4096) AS tsk
          |  FROM parts)
          |SELECT size(graft_freq_sketch_items(fsk)) AS n_items,
          |  graft_freq_sketch_max_error(fsk) AS ferr,
          |  graft_theta_estimate(tsk) AS test,
          |  graft_theta_is_estimation(tsk) AS tmode,
          |  graft_theta_set_estimate(tsk, tsk, 'intersect') AS tself
          |FROM m""".stripMargin).head()
      assert(r5.getInt(0) == 7 && r5.getLong(1) == 0L)
      assert(r5.getDouble(2) == 7.0 && !r5.getBoolean(3))
      assert(r5.getDouble(4) == 7.0)

      // KLL quantile sketch through pure SQL: exact regime (150 < 201),
      // INCLUSIVE median of 1..150 is 75
      val r6 = spark.sql(
        """WITH src AS (SELECT id % 4 AS shard, CAST(id AS DOUBLE) AS v
          |  FROM range(1, 151)),
          |parts AS (SELECT graft_kll_sketch_agg(v, 200) AS ksk
          |  FROM src GROUP BY shard),
          |m AS (SELECT graft_kll_merge(ksk, 200) AS ksk FROM parts)
          |SELECT graft_kll_quantile(ksk, 0.5) AS q50,
          |  graft_kll_rank(ksk, 75.0) AS r75,
          |  graft_kll_summary(ksk).n AS n,
          |  graft_kll_summary(ksk).is_estimation AS est
          |FROM m""".stripMargin).head()
      assert(r6.getDouble(0) == 75.0)
      assert(r6.getDouble(1) == 0.5)
      assert(r6.getLong(2) == 150L && !r6.getBoolean(3))
    } finally {
      // leave the shared session intact for other suites
    }
  }
}
