package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface test for the GraftExtensions function registry. */
class ExtensionsSpec extends AnyFunSuite {

  test("custom kernels callable from spark.sql") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
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
    } finally {
      // leave the shared session intact for other suites
    }
  }
}
