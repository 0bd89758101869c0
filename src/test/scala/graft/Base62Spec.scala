package graft

import org.apache.spark.sql.functions._

/** Independent check of the base62 ladder (q300 renders it through the
  * SAME generator in both dialects, so the oracle alone can't catch a
  * generator bug): compare against BigInt division-loop encoding with
  * the seq.go std alphabet + 12-char zero padding. */
class Base62Spec extends SparkSpec {

  private def ref(n: Long): String = {
    val a = operators.TurnOrdering.Base62Alphabet
    var x = BigInt(n)
    val sb = new StringBuilder
    if (x == 0) sb.append('0')
    while (x > 0) { sb.append(a((x % 62).toInt)); x /= 62 }
    val raw = sb.reverse.toString
    ("0" * (12 - raw.length)) + raw
  }

  test("ladder encoding equals division-loop reference incl. int64 max") {
    val cases = Seq(0L, 1L, 9L, 10L, 61L, 62L, 63L, 3843L, 3844L,
      123456789L, 839299365868340223L, Long.MaxValue)
    for (n <- cases) {
      val got = spark.sql(
        s"SELECT ${operators.TurnOrdering.base62Ladder(n.toString, "DIV")} AS s")
        .collect()(0).getString(0)
      assert(got == ref(n), s"n=$n got=$got want=${ref(n)}")
      assert(got.length == 12)
    }
  }
}
