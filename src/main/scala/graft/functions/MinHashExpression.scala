package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** k-MinHash signature over a shingle array in ONE pass.
  *
  * The naive formulation (`transform` + `array_min` once per hash function)
  * re-hashes every shingle string k times through interpreted higher-order
  * lambdas. This kernel hashes each shingle ONCE and derives the k
  * "independent" hash functions by mixing the base hash with a per-function
  * golden-ratio offset through a splitmix64 finalizer — the standard
  * cheap-family construction (cf. "Less Hashing, Same Performance",
  * Kirsch & Mitzenmacher 2006). Keeps the whole signature computation
  * inside whole-stage codegen.
  *
  * The base hash is the first 8 bytes of MD5 (big-endian) — PORTABLE, like
  * [[SimHash64]]: any engine with `md5()` and 64-bit integer arithmetic
  * rebuilds every signature bit-for-bit (the DuckDB oracle re-derives the
  * full 128-hash signatures and the band collisions; splitmix64 is pure
  * wrapping u64 arithmetic, emulated exactly with HUGEINT). MD5 costs ~10×
  * a native hash per shingle — noise next to the bucket shuffle and
  * candidate join the signatures feed, and the price of an independent
  * correctness oracle for the whole LSH plan.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val base = MinHashSig.hashUtf8(s)
      var j = 0
      while (j < numHashes) {
        val h = MinHashSig.mix(base ^ (MinHashSig.Golden * (j + 1)))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val cls = MinHashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $base = $cls.hashUtf8($a.getUTF8String($i));
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $h = $cls.mix($base ^ (${MinHashSig.Golden}L * ($j + 1)));
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSig {
  final val Golden = 0x9E3779B97F4A7C15L

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of MD5 over the shingle's UTF-8 bytes, big-endian, as a
    * signed long — exactly the integer an oracle derives from the first 16
    * hex chars of a SQL `md5()` (the [[SimHash64.tokenHash]] construction).
    */
  def hashUtf8(s: UTF8String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** splitmix64 finalizer — full-avalanche mixing of base ^ f(j). */
  def mix(z0: Long): Long = {
    var z = z0 + Golden
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def minhash(shingles: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(shingles), numHashes))
}
