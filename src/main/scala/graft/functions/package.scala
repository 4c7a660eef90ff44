package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.SparkBridge

/** Column-API entry points for graft's custom Catalyst expressions. */
package object functions {

  /** 64-bit rolling polynomial fingerprint of a string — see
    * [[RollingHash64]].
    */
  def rolling_hash64(c: Column): Column =
    SparkBridge.toColumn(RollingHash64(SparkBridge.toExpression(c)))

  /** Engine-portable mod-prime rolling fingerprint of a string — see
    * [[RollingHashMod]].
    */
  def rolling_hash_mod(c: Column): Column =
    SparkBridge.toColumn(RollingHashMod(SparkBridge.toExpression(c)))

  /** MinHash signature (`array<long>`, length n) of an array<string>
    * column — see [[MinHashSignature]].
    */
  def minhash_signature(c: Column, n: Int): Column =
    SparkBridge.toColumn(MinHashSignature(SparkBridge.toExpression(c), n))

  /** 64-bit SimHash of an array<string> column — see [[SimHash64]]. */
  def simhash64(c: Column): Column =
    SparkBridge.toColumn(SimHash64(SparkBridge.toExpression(c)))

  /** Distinct n-word shingles of a string column — see
    * [[WordShingles]].
    */
  def word_shingles(c: Column, n: Int): Column =
    SparkBridge.toColumn(WordShingles(SparkBridge.toExpression(c), n))

  /** Sequential-fold dot product of two array<double> columns — see
    * [[DotProduct]].
    */
  def dot_product(a: Column, b: Column): Column =
    SparkBridge.toColumn(DotProduct(SparkBridge.toExpression(a), SparkBridge.toExpression(b)))

  /** Exact BIGINT dot product of two array<long> columns — see
    * [[DotProductLong]].
    */
  def dot_long(a: Column, b: Column): Column =
    SparkBridge.toColumn(DotProductLong(SparkBridge.toExpression(a), SparkBridge.toExpression(b)))

  /** Hilbert-curve index (order 16) of two bigint coordinate columns
    * — see [[HilbertIndex]].
    */
  def hilbert_index(x: Column, y: Column): Column =
    SparkBridge.toColumn(HilbertIndex(SparkBridge.toExpression(x), SparkBridge.toExpression(y)))

  /** Collapse consecutive repeated tokens in a string — see
    * [[CollapseRuns]].
    */
  def collapse_runs(c: Column): Column =
    SparkBridge.toColumn(CollapseRuns(SparkBridge.toExpression(c)))

  /** Characters of a string column gathered at an array<int> of char
    * positions — see [[CharsAt]].
    */
  def chars_at(s: Column, positions: Column): Column =
    SparkBridge.toColumn(CharsAt(SparkBridge.toExpression(s), SparkBridge.toExpression(positions)))

  /** Random-hyperplane LSH bucket keys (array<int>, length numTables)
    * of an array<double> vector — see [[LshBuckets]].
    */
  def lsh_buckets(vec: Column, numTables: Int, planesPerTable: Int): Column =
    SparkBridge.toColumn(LshBuckets(SparkBridge.toExpression(vec), numTables, planesPerTable))

  /** Greedy left-to-right merge of adjacent (left, right) token pairs
    * into `left_right` — see [[MergeAdjacent]].
    */
  def merge_adjacent(tokens: Column, left: Column, right: Column): Column =
    SparkBridge.toColumn(MergeAdjacent(
      SparkBridge.toExpression(tokens), SparkBridge.toExpression(left),
      SparkBridge.toExpression(right)))

  /** Bloom-filter membership over an array<long> bitmap — see
    * [[BloomMightContain]].
    */
  def bloom_might_contain(bitmap: Column, h1: Column, h2: Column, m: Int, k: Int): Column =
    SparkBridge.toColumn(BloomMightContain(
      SparkBridge.toExpression(bitmap), SparkBridge.toExpression(h1),
      SparkBridge.toExpression(h2), m, k))

  /** Binary-search bucket index of a bigint key against sorted
    * distinct literal cuts — see [[SearchSortedLong]].
    */
  def search_sorted(key: Column, cuts: Seq[Long]): Column =
    SparkBridge.toColumn(SearchSortedLong(SparkBridge.toExpression(key), cuts))
}
