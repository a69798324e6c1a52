package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-sketch column library for near-duplicate detection: word
  * shingles, MinHash signatures, LSH band keys, SimHash. All built on
  * Spark's codegen'd `xxhash64` and higher-order array functions — no
  * UDFs, so signatures are computed in the scan stage.
  *
  * These are the scale path for dedup: exact all-pairs Jaccard is
  * quadratic, while MinHash/SimHash banding turns it into a hash
  * partition on (band, key) whose cost is proportional to true-duplicate
  * density (Broder's MinHash / Charikar's SimHash — see PAPERS.md corpus).
  */
object Hashing {

  /** Distinct n-gram word shingles of a token array; empty when the doc
    * has fewer than n tokens (sequence() would go descending otherwise).
    */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature: k permutations simulated as seeded xxhash64
    * (hash of (perm-index, shingle)); sig[i] = min over shingles.
    */
  def minhashSignature(shingleArr: Column, k: Int = 64): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingleArr, s => xxhash64(i, s))))

  /** LSH band keys of a MinHash signature: bands of `r` rows, each band
    * reduced to one 64-bit key = xxhash64(bandIdx, sig rows...). Emits an
    * array of (k/r) keys; docs sharing any (bandIdx, key) are candidates.
    */
  def bandKeys(sig: Column, k: Int = 64, r: Int = 2): Column =
    transform(sequence(lit(0), lit(k / r - 1)), b =>
      xxhash64((b +: (0 until r).map(j => element_at(sig, b * r + j + 1))): _*))

  /** 64-bit SimHash of a token array: bit k is the sign of the per-bit
    * vote sum over token hashes. Computed as a fold over 64 bit
    * positions of codegen'd bit tests — one pass over the tokens per doc.
    */
  def simhash(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { k =>
      val vote = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, k).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << k)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 16-bit chunks of a 64-bit sketch for Hamming-band joins: two sketches
    * within Hamming distance 3 share at least one of the 4 chunks
    * (pigeonhole), so equality on (chunkIdx, chunkValue) is a complete
    * candidate generator for d ≤ 3.
    */
  def hammingBands(sketch: Column): Column =
    array((0 until 4).map(i =>
      struct(lit(i).as("band"),
        shiftright(sketch, i * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*)
}
