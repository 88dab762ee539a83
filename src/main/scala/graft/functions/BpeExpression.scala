package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair-encoding (BPE) subword tokenization as a native
  * Catalyst kernel — the step from "counts whitespace tokens" to "counts
  * training tokens": token budgets (mix2), sequence packing (sq1), and
  * per-doc token stats are all denominated in merge-table tokens once the
  * pipeline targets a real tokenizer (Sennrich et al. '16, arXiv:1508.07909;
  * the reference stops at pandas-level stats, `tool_call_agent.py:131-141`).
  *
  * Semantics (the subword-nmt / HF word-level contract): each whitespace
  * word starts as its code points; repeatedly the LOWEST-RANK adjacent pair
  * present in the merge table is merged, all its occurrences left-to-right
  * in one pass, until no listed pair remains. No end-of-word marker — both
  * engines of the oracle pair agree on the unmarked form.
  *
  * Scale design: the merge table travels WITH the expression (serialized
  * into the task binary like any literal — a merge table is KBs), and each
  * executor JVM builds the rank map + per-word memo once per distinct table
  * ([[BpeVocab.tableFor]] keyed by content). Tokenization is a pure
  * per-row map over a bounded-size memo of distinct words — no shuffle, no
  * broadcast round-trip, whole-stage codegen via the WordShingles pattern.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val table: BpeVocab.Table = BpeVocab.tableFor(merges)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BpeVocab.count(table, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = BpeVocab.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val tbl = ctx.addReferenceObj("bpeTable", table,
        classOf[BpeVocab.Table].getName)
      s"${ev.value} = $cls.count($tbl, $a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Full subword token stream of a document (all words' BPE tokens in
  * order) — the projection training shards are written from.
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val table: BpeVocab.Table = BpeVocab.tableFor(merges)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BpeVocab.tokens(table, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = BpeVocab.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val tbl = ctx.addReferenceObj("bpeTable", table,
        classOf[BpeVocab.Table].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$cls.tokens($tbl, $a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeVocab {

  /** Per-JVM compiled merge table: rank lookup + bounded per-word memo.
    * Validation enforces the property that makes ascending-rank exhaustive
    * application (the SQL-replayable form the DuckDB oracle runs) equal to
    * lowest-rank-first greedy (the canonical form this kernel runs): every
    * merge's components must be single code points or outputs of STRICTLY
    * EARLIER merges — true of any properly trained table, checked here so a
    * hand-edited table can't silently diverge from its oracle.
    */
  final class Table(val merges: IndexedSeq[(String, String)]) extends Serializable {
    // an EMPTY table is the valid degenerate: pure code-point tokenization
    // (the trainer's round-0 state)
    val rank = new java.util.HashMap[String, Integer](merges.size * 2)
    locally {
      val produced = new java.util.HashSet[String]()
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        require(a.nonEmpty && b.nonEmpty, s"empty merge component at rank $i")
        def valid(p: String) =
          p.codePointCount(0, p.length) == 1 || produced.contains(p)
        require(valid(a) && valid(b),
          s"merge $i ($a,$b): components must be single code points or " +
            "outputs of earlier merges")
        val k = a + "\u0000" + b
        require(rank.put(k, i) == null, s"duplicate merge pair ($a,$b)")
        produced.add(a + b)
      }
    }
    // Distinct-word memo: corpora repeat words massively, so tokenization
    // cost is per distinct word, not per occurrence. Bounded — an
    // adversarial high-cardinality column degrades to compute-only instead
    // of growing the heap.
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    val memoCap = 1 << 16
  }

  // One compiled table per distinct merge list per JVM — executors hit this
  // through the deserialized expression's first eval.
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Seq[(String, String)], Table]()
  def tableFor(merges: Seq[(String, String)]): Table =
    tables.computeIfAbsent(merges, m => new Table(m.toIndexedSeq))

  /** Lowest-rank-first greedy merge of one word (no memo). */
  private def tokenizeUncached(t: Table, word: String): Array[String] = {
    // seed: one token per code point
    var toks = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var off = 0
    while (off < word.length) {
      val cp = word.codePointAt(off)
      val n = Character.charCount(cp)
      toks(i) = word.substring(off, off + n)
      i += 1
      off += n
    }
    while (toks.length > 1) {
      var best = Int.MaxValue
      var j = 0
      while (j < toks.length - 1) {
        val r = t.rank.get(toks(j) + "\u0000" + toks(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) return toks
      val (a, b) = t.merges(best)
      val out = new java.util.ArrayList[String](toks.length)
      j = 0
      while (j < toks.length) {
        if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
          out.add(a + b); j += 2
        } else { out.add(toks(j)); j += 1 }
      }
      toks = out.toArray(new Array[String](out.size))
    }
    toks
  }

  /** Tokenize one word, NFC-normalizing first so canonically-equivalent
    * inputs ("café" composed U+00E9 vs decomposed e+U+0301) produce the
    * SAME token stream — without this, mixed-form corpora split their
    * merge statistics across visually identical words and fertility
    * (tok2) over-counts. `isNormalized` is a cheap prefix check that
    * short-circuits for ASCII/NFC text (the common case — and the whole
    * oracle corpus), so committed hashes are unaffected. The memo is
    * keyed on the RAW word: normalization is deterministic, so both forms
    * memoize to the same array.
    *
    * Unsegmented scripts (CJK): whitespace splitting yields one long
    * "word"; the seed is its code points, so with no applicable merges
    * the count degrades to code points — the code-point-fallback analog
    * of byte-level BPE's byte fallback. Train merges on the script
    * (BpeVocab.train is script-agnostic) to bring fertility down; the
    * bounded memo keeps repeated long words compute-only.
    */
  def tokenizeWord(t: Table, word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val hit = t.memo.get(word)
    if (hit != null) return hit
    val nfc =
      if (java.text.Normalizer.isNormalized(word, java.text.Normalizer.Form.NFC)) word
      else java.text.Normalizer.normalize(word, java.text.Normalizer.Form.NFC)
    val res = tokenizeUncached(t, nfc)
    if (t.memo.size < t.memoCap) t.memo.put(word, res)
    res
  }

  /** Words of a document under the engine's split contract —
    * `trim()`/`split("\\s+", -1)`, matching [[WordShingles.shingle]] (sql
    * trim strips spaces only; limit -1 keeps trailing empties, which
    * tokenize to zero tokens).
    */
  private def words(s: UTF8String): Array[String] =
    s.trim().toString.split("\\s+", -1)

  def count(t: Table, s: UTF8String): Long = {
    val ws = words(s)
    var total = 0L
    var i = 0
    while (i < ws.length) { total += tokenizeWord(t, ws(i)).length; i += 1 }
    total
  }

  def tokens(t: Table, s: UTF8String): ArrayData = {
    val ws = words(s)
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < ws.length) {
      val tk = tokenizeWord(t, ws(i))
      var k = 0
      while (k < tk.length) { out.add(UTF8String.fromString(tk(k))); k += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The committed vocab fixture: 48 merges trained by classic BPE (greedy
    * max-frequency pair, ties to the lexicographically smallest pair) on the
    * sf0.001 `documents` word frequencies. Fixed and committed so every SF
    * tokenizes under the SAME table — corpus BPE/whitespace token ratio
    * ~2.3×, i.e. the fixture genuinely splits words (window→1 token,
    * customer→5), it doesn't degenerate to whole-word or per-char.
    */
  val Fixture: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("c", "o"), ("co", "lu"), ("colu", "m"), ("colum", "n"),
    ("d", "ow"), ("in", "dow"), ("w", "indow"), ("d", "er"), ("or", "der"),
    ("or", "t"), ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"),
    ("ag", "g"), ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"),
    ("l", "ine"), ("e", "y"), ("k", "ey"), ("j", "o"), ("jo", "in"),
    ("g", "e"), ("mer", "ge"), ("er", "y"), ("g", "r"), ("gr", "o"),
    ("gro", "up"), ("q", "u"), ("qu", "ery"), ("c", "t"), ("ct", "or"),
    ("e", "ctor"))

  def bpeTokenCount(text: Column, merges: Seq[(String, String)] = Fixture): Column =
    GraftSqlBridge.column(BpeTokenCount(GraftSqlBridge.expression(text), merges))

  def bpeTokens(text: Column, merges: Seq[(String, String)] = Fixture): Column =
    GraftSqlBridge.column(BpeTokens(GraftSqlBridge.expression(text), merges))

  /** Train a merge table IN-ENGINE: classic BPE (Sennrich '16 alg. 1) over
    * the corpus's word-frequency table — per round, tokenize the DISTINCT
    * words under the merges-so-far, count adjacent token pairs weighted by
    * word frequency (one distributed aggregate), take the max-count pair
    * (ties to the lexicographically smallest — fully deterministic), and
    * append. The committed [[Fixture]] is exactly
    * `train(sf0.001 documents, "text", 48)` (BpeSpec pins this).
    *
    * Scale shape: the corpus text is scanned ONCE (the word-frequency
    * groupBy); all `numMerges` rounds run over the distinct-word frame —
    * vocabulary-sized, not corpus-sized — and each round moves one
    * (pair, count) row to the driver. Real pipelines train on a sampled
    * corpus for the same reason; pass a `.sample(...)` frame here.
    */
  def train(docs: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val words = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .where(col("__w") =!= "")
      .groupBy(col("__w"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("__f"))
      .persist(mad)
    words.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val toks = bpeTokens(col("__w"), merges.toSeq)
      val z = arrays_zip(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1))
      val best = words
        .select(col("__f"), explode(z).as("__z"))
        .groupBy(col("__z").getField("0").as("a"), col("__z").getField("1").as("b"))
        .agg(sum(col("__f")).as("n"))
        .orderBy(desc("n"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        merges += ((best(0).getString(0), best(0).getString(1)))
        round += 1
      }
    }
    words.unpersist(blocking = false)
    merges.toSeq
  }
}
