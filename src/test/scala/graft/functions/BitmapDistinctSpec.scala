package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of [[BitmapDistinct]] (the q146 oracle gate covers
  * the end-to-end path): buffer growth, OR-merge of unequal lengths,
  * popcount finish, and the loud failure outside the dense domain.
  */
class BitmapDistinctSpec extends AnyFunSuite {

  test("reduce/merge/finish count distinct ids exactly") {
    val a = Seq(0L, 1L, 63L, 64L, 1000L).foldLeft(BitmapDistinct.zero)(BitmapDistinct.reduce)
    val b = Seq(1L, 64L, 4096L).foldLeft(BitmapDistinct.zero)(BitmapDistinct.reduce)
    assert(BitmapDistinct.finish(a) == 5L)
    assert(BitmapDistinct.finish(b) == 3L)
    val m = BitmapDistinct.merge(a, b)
    assert(BitmapDistinct.finish(m) == 6L) // union: 1 and 64 shared
    assert(BitmapDistinct.finish(BitmapDistinct.merge(b, a)) == 6L)
    assert(BitmapDistinct.finish(BitmapDistinct.merge(BitmapDistinct.zero, a)) == 5L)
  }

  test("ids outside the dense domain throw instead of mis-counting") {
    intercept[IllegalArgumentException] {
      BitmapDistinct.reduce(BitmapDistinct.zero, -1L)
    }
    intercept[IllegalArgumentException] {
      BitmapDistinct.reduce(BitmapDistinct.zero, BitmapDistinct.MaxBits)
    }
  }
}
