package graft.sources

/** Compressed position-set codec for delete-vector sidecars — the
  * roaring-bitmap role (Delta's DV blobs, Iceberg puffin) without an
  * external dependency: a SORTED run-length + varint-delta encoding.
  *
  * Layout: `varint(cardinality)` then one `(varint gap, varint runLen)`
  * pair per maximal run of consecutive positions, where `gap` is the
  * distance from the previous run's end (absolute start for the first).
  * A GDPR range erasure (one run of 10^7 positions) encodes in ~10
  * BYTES; uniformly random marks cost 1-3 bytes each — against 8-16+
  * bytes per mark as parquet `(file, pos)` rows, the ~100× sidecar-size
  * ceiling the format needed at 10^9-row erasures.
  *
  * Positions are non-negative file ordinals; duplicates in the input
  * are collapsed (set semantics — sidecar union is idempotent).
  */
object GraftBitmap {

  private def writeVarint(out: java.io.ByteArrayOutputStream,
      value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode a SORTED (ascending) position array; duplicates allowed and
    * collapsed.
    */
  def encode(sorted: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // distinct cardinality first (single pass, the array is sorted)
    var card = 0L
    var i = 0
    while (i < sorted.length) {
      if (i == 0 || sorted(i) != sorted(i - 1)) card += 1
      i += 1
    }
    writeVarint(out, card)
    var prevEnd = 0L // exclusive end of the previous run
    i = 0
    while (i < sorted.length) {
      val start = sorted(i)
      require(start >= prevEnd || (prevEnd == 0L && start >= 0L),
        s"positions must be sorted non-negative, got $start after $prevEnd")
      var end = start + 1
      i += 1
      while (i < sorted.length && sorted(i) <= end) {
        if (sorted(i) == end) end += 1
        i += 1 // == end - 1 is a duplicate: skip
      }
      writeVarint(out, start - prevEnd)
      writeVarint(out, end - start)
      prevEnd = end
    }
    out.toByteArray
  }

  private final class VarintReader(bytes: Array[Byte]) {
    private var i = 0
    def hasNext: Boolean = i < bytes.length
    def next(): Long = {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(i) & 0xff
        i += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
  }

  /** The encoded set's cardinality — header-only, O(bytes of one
    * varint).
    */
  def cardinality(bytes: Array[Byte]): Long =
    new VarintReader(bytes).next()

  /** Decode to CHUNKED runs `(start, length)` with each chunk capped at
    * `maxChunk` positions — the bounded-memory shape for distributed
    * explosion (`explode` + `sequence`): a 10^8-position range erasure
    * decodes to ~1.5k chunk descriptors instead of an 800 MB position
    * array, while scattered marks cost one descriptor each (no worse
    * than the flat decode).
    */
  def decodeRunChunks(bytes: Array[Byte], maxChunk: Int)
      : Array[(Long, Int)] = {
    require(maxChunk > 0, s"maxChunk must be positive: $maxChunk")
    val in = new VarintReader(bytes)
    in.next() // cardinality header
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    var prevEnd = 0L
    while (in.hasNext) {
      val start = prevEnd + in.next()
      val run = in.next()
      var p = start
      while (p < start + run) {
        val len = math.min(maxChunk.toLong, start + run - p).toInt
        out += ((p, len))
        p += len
      }
      prevEnd = start + run
    }
    out.toArray
  }

  /** Decode to the sorted position array. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val in = new VarintReader(bytes)
    val card = in.next()
    require(card <= Int.MaxValue, s"bitmap too large to materialize: $card")
    val out = new Array[Long](card.toInt)
    var k = 0
    var prevEnd = 0L
    while (in.hasNext) {
      val start = prevEnd + in.next()
      val run = in.next()
      var p = start
      while (p < start + run) {
        out(k) = p
        k += 1
        p += 1
      }
      prevEnd = start + run
    }
    require(k == card.toInt, s"corrupt bitmap: $k positions, header $card")
    out
  }
}
