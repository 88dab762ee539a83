package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar '02) of a document in ONE pass over its text.
  *
  * Replaces the explode-tokens → 64-sum-aggregates → reassemble pipeline
  * (a full shuffle on the doc id) with a pure per-row expression: tokenize,
  * hash each distinct token once, accumulate the 64 ±1 bit counters in a
  * local array, emit the sign bits. Bit-identical to the aggregate
  * formulation.
  *
  * The token hash is the first 8 bytes of MD5 (big-endian) — a PORTABLE
  * hash: any engine with an `md5()` function reproduces the signature
  * bit-for-bit (the DuckDB oracle rebuilds it from `substr(md5(tk),1,16)`
  * with integer arithmetic), unlike engine-private xxhash64. MD5 costs
  * ~10× xxhash64 per token, which is noise next to the candidate join the
  * signatures feed; its bit-uniformity is cryptographic-grade, which the
  * sign-aggregation step likes.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.simhash($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of MD5 over the token's UTF-8 bytes, big-endian, as a
    * signed long — exactly the integer an oracle derives from the first 16
    * hex chars of a SQL `md5()`.
    */
  def tokenHash(tok: String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  def simhash(s: UTF8String): Long = {
    // sql-trim (spaces only) + split limit -1, matching the Spark built-ins
    // (see WordShingles)
    val toks = s.trim().toString.split("\\s+", -1)
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = tokenHash(toks(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def simhash64(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text)))
}
