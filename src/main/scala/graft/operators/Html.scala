package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → main-content extraction: stage 0 of a crawl-derived training
  * corpus (C4 arXiv:1910.10683 §2.2 / CCNet arXiv:1911.00359 lineage —
  * both strip markup and drop boilerplate before any quality gate sees
  * the text). The reference's pipeline starts at clean text; a real crawl
  * pipeline starts HERE.
  *
  * Semantics, in order:
  *   1. drop `<head>…</head>` whole (title/meta/style/script never reach
  *      the text), then any remaining `<script>`/`<style>` elements and
  *      `<!-- comments -->`;
  *   2. split what remains into BLOCKS on block-level tag boundaries
  *      (`p`, `div`, `li`, headings, table cells, `nav`, `footer`, …) —
  *      inline tags (`<a>`, `<b>`, …) stay inside their block;
  *   3. per block, compute the visible text (tags → space, whitespace
  *      collapsed, trimmed) and the LINK-TEXT character count (characters
  *      inside `<a>…</a>` after tag stripping); drop empty blocks and
  *      blocks whose link density exceeds 1/2 (`2·linkChars > visible`) —
  *      the classic link-density boilerplate filter that removes nav
  *      bars, footers and link farms while keeping paragraphs that merely
  *      CONTAIN a link;
  *   4. join survivors in document order, decode the five standard
  *      entities plus `&nbsp;` (after tag stripping, so a decoded `&lt;`
  *      can never resurrect as markup; `&amp;` decodes last, the standard
  *      order), collapse whitespace once more, trim.
  *
  * Scale shape: map-only — one narrow projection per document, zero
  * shuffles, zero UDFs. Every step is a built-in string/array expression
  * (`regexp_replace`/`split`/`transform`/`filter`/`aggregate`), so the
  * whole extraction fuses into the scan's projection; at 100 TB this
  * stage costs exactly one pass over the raw bytes, which is the floor.
  *
  * Determinism: regex patterns restricted to the Java-regex ∩ RE2 common
  * subset (no backreferences/lookaround, explicit `[ \t\n\r]` instead of
  * the engine-dependent `\s`), integer link-density comparison (no
  * float), so a DuckDB oracle replays the rules verbatim and the output
  * strings hash-match.
  */
object Html {

  /** Whole-element strips, applied before block splitting. */
  private val HeadPat = "(?is)<head[^>]*>.*?</head>"
  private val ScriptPat = "(?is)<script[^>]*>.*?</script>"
  private val StylePat = "(?is)<style[^>]*>.*?</style>"
  private val CommentPat = "(?s)<!--.*?-->"

  /** Block-level tag boundary (open or close) — the split points. */
  private val BlockPat =
    "(?i)</?(?:html|head|body|title|p|div|br|hr|h[1-6]|ul|ol|li|table|" +
      "thead|tbody|tr|td|th|section|article|header|footer|nav|" +
      "blockquote|pre|form)[^>]*>"

  /** Any remaining (inline) tag. */
  private val TagPat = "<[^>]*>"

  /** Whitespace run — explicit class, not `\s` (Java's includes \x0B,
    * RE2's does not; the explicit class behaves identically in both). */
  private val WsPat = "[ \t\n\r]+"

  /** Anchor element; group 1 = the link text (may contain inline tags).
    * The tag-name boundary is explicit (`<a` followed by whitespace+attrs
    * or nothing) so `<abbr>`, `<aside>`, `<audio>`, `<address>`, `<area>`
    * do NOT match — a bare `<a[^>]*>` would count everything from such a
    * tag to the next `</a>` as link text, inflating link density and
    * wrongly dropping genuine content blocks. Still Java∩RE2. */
  private val APat = "(?is)<a(?:[ \t\n\r][^>]*)?>(.*?)</a[ \t\n\r]*>"

  /** Visible text of one block: tags become spaces, whitespace collapses,
    * ends trim. */
  private def visible(b: Column): Column =
    trim(regexp_replace(regexp_replace(b, TagPat, " "), WsPat, " "))

  /** Characters of link text in one block (tag-stripped `<a>` contents,
    * summed). */
  private def linkChars(b: Column): Column =
    coalesce(
      aggregate(regexp_extract_all(b, lit(APat), lit(1)), lit(0),
        (acc, x) => acc + length(regexp_replace(x, TagPat, ""))),
      lit(0))

  /** Decode the standard entities on TAG-FREE text; `&amp;` last. */
  def decodeEntities(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(c, "&lt;", "<"),
              "&gt;", ">"),
            "&quot;", "\""),
          "&#39;", "'"),
        "&nbsp;", " "),
      "&amp;", "&")

  /** Per-block (visible, linkChars) structs after the whole-element
    * strips — the shared core of [[mainContent]] and [[extract]]. */
  private def blockStructs(html: Column): Column = {
    val body =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(html, HeadPat, " "),
            ScriptPat, " "),
          StylePat, " "),
        CommentPat, " ")
    transform(split(body, BlockPat), b =>
      struct(visible(b).as("vis"), linkChars(b).as("lc")))
  }

  private def keptBlocks(bs: Column): Column =
    filter(bs, s =>
      length(s("vis")) > 0 && s("lc") * lit(2) <= length(s("vis")))

  private def joinBlocks(kept: Column): Column =
    trim(regexp_replace(
      decodeEntities(array_join(transform(kept, s => s("vis")), " ")),
      WsPat, " "))

  /** The extracted main content as a single Column — the form
    * [[graft.plans.CorpusPipeline]] wires ahead of the quality gates. */
  def mainContent(html: Column): Column =
    joinBlocks(keptBlocks(blockStructs(html)))

  /** `href` attribute of every anchor — the link targets a crawl's URL
    * frontier is built from. Two map-only `regexp_extract_all` passes
    * (double-quoted then single-quoted attributes, concatenated in that
    * order — a fixed order both engines replay); Java∩RE2 subset like
    * every pattern here. */
  def hrefs(html: Column): Column =
    concat(
      regexp_extract_all(html,
        lit("(?i)<a[ \t\n\r][^>]*href=\"([^\"]*)\""), lit(1)),
      regexp_extract_all(html,
        lit("(?i)<a[ \t\n\r][^>]*href='([^']*)'"), lit(1)))

  /** Per-document extraction with block accounting: `(idCol, main_text,
    * n_blocks, n_kept)` where `n_blocks` counts non-empty visible blocks
    * and `n_kept` the ones surviving the link-density filter. */
  def extract(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val bs = blockStructs(col(htmlCol))
    docs.select(col(idCol),
      joinBlocks(keptBlocks(bs)).as("main_text"),
      size(filter(bs, s => length(s("vis")) > 0)).cast("long").as("n_blocks"),
      size(keptBlocks(bs)).cast("long").as("n_kept"))
  }
}
