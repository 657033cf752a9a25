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
    * as a single shingle so they still participate. Compiled kernel
    * ([[Sketches.shinglesKernel]]).
    */
  def shingles(toks: Column, n: Int = 3): Column = Sketches.shinglesUdf(n)(toks)

  /** Distinct shingles pre-hashed to 64-bit keys (elementwise
    * `xxhash64(shingle)`, computed in the same kernel pass) — for
    * join/count/intersect-only consumers; see
    * [[Sketches.hashedShinglesKernel]].
    */
  def hashedShingles(toks: Column, n: Int = 3): Column =
    Sketches.hashedShinglesUdf(n)(toks)

  /** MinHash signature: k simulated permutations via double hashing;
    * signature element j = min over shingles. Compiled kernel
    * ([[Sketches.minhashKernel]]) — the HOF-lambda formulation of the same
    * computation is interpreted per element and measured 3000× slower.
    */
  def minhash(sh: Column, k: Int = 32): Column = Sketches.minhashUdf(k)(sh)

  /** LSH band keys from a MinHash signature: `bands` buckets, each hashing
    * `rows = k/bands` consecutive signature slots. Two docs land in the
    * same (band, key) bucket iff that band's slots all match — the classic
    * banding construction (P[candidate] = 1-(1-J^rows)^bands).
    */
  def lshBands(sig: Column, bands: Int, rows: Int, sigLen: Int = 32): Column = {
    // an oversized banding config would slice past the signature into empty
    // arrays, hashing every doc into one shared bucket per trailing band —
    // the candidate join silently degenerates toward all-pairs
    require(bands * rows <= sigLen,
      s"bands*rows = ${bands * rows} exceeds signature length $sigLen")
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(array_join(slice(sig, b * rows + lit(1), lit(rows)), ",")).as("key")))
  }

  /** Band keys from a packed 64-bit long sketch (SimHash / SRP): `bands`
    * (band, key) structs of `bitsPerBand` consecutive bits each — the long
    * analog of [[lshBands]]. Pairs sharing any band are candidates
    * (pigeonhole: complete for hamming ≤ bands-1).
    */
  def longBands(sketch: Column, bands: Int, bitsPerBand: Int): Column = {
    require(bands * bitsPerBand <= 64,
      s"bands*bitsPerBand = ${bands * bitsPerBand} exceeds 64 sketch bits")
    val mask = (1L << bitsPerBand) - 1L
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        call_function("shiftright", sketch, b * bitsPerBand)
          .bitwiseAND(mask).as("key")))
  }

  /** Estimated Jaccard similarity from two MinHash signatures: fraction of
    * matching slots over the common length (symmetric even if the
    * signatures were built with different k). Native codegen Expression
    * ([[org.apache.spark.sql.graftexpr.SigAgree]]) — the HOF
    * `size(filter(zip_with(…)))/least(…)` formulation of the same fold is
    * interpreted per slot and breaks whole-stage codegen on the
    * candidate-pair re-rank. One deliberate divergence from that HOF: two
    * empty signatures score 0.0, not the HOF's 0/0 → NaN/DIVIDE_BY_ZERO —
    * a NaN similarity would pass every `>= threshold` filter (Spark orders
    * NaN above all doubles). The divergence and the unequal-length
    * behavior are pinned by DotProductSpec.
    */
  def minhashSimilarity(sigA: Column, sigB: Column): Column = {
    import org.apache.spark.sql.graftexpr.{GraftExprBridge => B, SigAgree}
    B.column(SigAgree(B.expression(sigA), B.expression(sigB)))
  }

  /** 64-bit SimHash of a token array: bit k of the result is 1 iff the
    * majority of token hashes have bit k set (weighted bit-vote).
    * Compiled kernel ([[Sketches.simhashKernel]]).
    */
  def simhash64(toks: Column): Column = Sketches.simhashUdf(toks)

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
