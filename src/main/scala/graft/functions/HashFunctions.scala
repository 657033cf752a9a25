package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-sketch primitives for near-duplicate detection at corpus scale:
  * word-n-gram shingles, MinHash signatures, and SimHash — all built from
  * codegen'd Catalyst builtins (`xxhash64`, higher-order array functions),
  * no UDFs, so signature computation runs inside whole-stage codegen and
  * parallelizes embarrassingly (one pass over the corpus, no shuffle until
  * the candidate-pair join).
  *
  * Determinism: `xxhash64` is a fixed-seed (42) 64-bit hash, stable across
  * Spark versions/partitionings — signatures are reproducible, which the
  * LSH banding join requires.
  */
object HashFunctions {

  /** Distinct word n-gram shingles of a token array (the MinHash input
    * universe). Docs with fewer than `n` tokens get their whole token array
    * as a single shingle so they still participate.
    */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(
      when(size(toks) < n, array(array_join(toks, " ")))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + lit(1), lit(n)), " "))))

  /** MinHash signature: k independent permutations simulated as
    * `xxhash64(seed_j, shingle)`; signature element j = min over shingles.
    * One array expression per row — no shuffle, no UDF.
    */
  def minhash(sh: Column, k: Int = 32): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(sh, s => xxhash64(j, s))))

  /** LSH band keys from a MinHash signature: `bands` buckets, each hashing
    * `rows = k/bands` consecutive signature slots. Two docs land in the
    * same (band, key) bucket iff that band's slots all match — the classic
    * banding construction (P[candidate] = 1-(1-J^rows)^bands).
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(array_join(slice(sig, b * rows + lit(1), lit(rows)), ",")).as("key")))

  /** Estimated Jaccard similarity from two MinHash signatures: fraction of
    * matching slots.
    */
  def minhashSimilarity(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      x => x === 1)).cast("double") / size(sigA).cast("double")

  /** 64-bit SimHash of a token array: bit k of the result is 1 iff the
    * majority of token hashes have bit k set (weighted bit-vote). Built as
    * a 64-slot bit-vote array folded into one long.
    */
  def simhash64(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    val nTok = size(toks)
    // votes(k) = #tokens with bit k set, majority → bit k of output
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, k) => {
        // shiftright/shiftleft Scala helpers only take Int bit counts; the
        // SQL functions accept column bit counts, so call them by name.
        val votes = size(filter(hashes,
          h => call_function("shiftright", h, k).bitwiseAND(1L) === 1L))
        acc.bitwiseOR(
          when(votes * 2 >= nTok, call_function("shiftleft", lit(1L), k))
            .otherwise(0L))
      })
  }

  /** Hamming distance between two 64-bit sketches (SimHash comparison). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling (Rabin-Karp-style) document fingerprint: polynomial fold of
    * the per-token hashes — order-*sensitive*, unlike
    * [[TextFunctions.fingerprint]]; two docs collide only if they are the
    * same token sequence.
    */
  def rollingFingerprint(toks: Column): Column =
    // polynomial fold mod the Mersenne prime 2^31-1 — keeps every
    // intermediate < 2^52, so no ANSI-mode long overflow
    aggregate(transform(toks, t => pmod(xxhash64(t), lit(2147483647L))),
      lit(0L),
      (acc, h) => pmod(acc * 1000003L + h, lit(2147483647L)))
}
