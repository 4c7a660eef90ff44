package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level guarantees of the CharsAt gather and the LshBuckets
  * input contract — the edges the corpus-level specs can't reach
  * (non-ASCII payloads, wrong-width vectors).
  */
class GatherExprSpec extends AnyFunSuite {

  private def gather(s: String, pos: Int*): String =
    CharsAt.compute(UTF8String.fromString(s),
      new GenericArrayData(pos.toArray.map(_.asInstanceOf[Any]))).toString

  test("CharsAt: ASCII fast path gathers bytes, skips out-of-range") {
    assert(gather("hello", 0, 4, 1) == "hoe")
    assert(gather("hello", -1, 99) == "")
    assert(gather("", 0) == "")
  }

  test("CharsAt: non-ASCII path indexes CODE POINTS, never splits surrogates") {
    // "a😀b": code points [a, 😀, b]; UTF-16 units [a, hi, lo, b] —
    // positions must follow the substr(text, p+1, 1) mirror semantics
    val s = "a😀b"
    assert(gather(s, 0) == "a")
    assert(gather(s, 1) == "😀")
    assert(gather(s, 2) == "b")
    assert(gather(s, 3) == "") // beyond last code point
    // multi-byte but BMP (two-byte UTF-8): é at char index 1
    assert(gather("café!", 3, 4) == "é!")
  }

  test("LshBuckets: rejects non-64-dim vectors loudly") {
    val short = new GenericArrayData(Array.fill(8)(0.5.asInstanceOf[Any]))
    val e = intercept[IllegalArgumentException](LshBuckets.compute(short, 4, 6))
    assert(e.getMessage.contains("64-dim"))
    val ok = new GenericArrayData(Array.fill(64)(0.5.asInstanceOf[Any]))
    assert(LshBuckets.compute(ok, 4, 6).numElements() == 4)
  }
}
