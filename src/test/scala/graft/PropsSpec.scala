package graft

import graft.engine.Types
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the pure layer (SURVEY §5: ScalaCheck for
  * constraint/scalar functions). Plain ScalaCheck generators sampled
  * with a fixed seed (no scalatest bridge in the offline cache).
  */
class PropsSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val ident: Gen[String] =
    Gen.chooseNum(0, 140).flatMap(n => Gen.stringOfN(n, Gen.asciiPrintableChar))

  test("quoteName: round-trip property — unquoting recovers the input") {
    samples(ident).foreach { s =>
      Types.quoteName(s) match {
        case None => assert(s.length > 128)
        case Some(q) =>
          assert(q.head == '[' && q.last == ']')
          val body = q.substring(1, q.length - 1)
          assert(body.replace("]]", "]") == s)
      }
    }
  }

  test("qualifyName: empty schema yields bare table") {
    samples(Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr)).foreach { case (sc, t) =>
      val q = Types.qualifyName(sc, t)
      if (sc.isEmpty) assert(q == t) else assert(q == s"$sc.$t")
    }
  }

  test("translateDtype: known families collapse, the rest pass through") {
    val known = Set("text", "number", "decimal", "datetime")
    samples(Gen.oneOf("object", "str", "int64", "uint8", "float32",
      "datetime64[ns]", "bool", "category")).foreach { name =>
      val out = Types.translateDtype(name)
      assert(known.contains(out) || out == name)
    }
  }

  test("isCastExplicit string lattice: unknown sources always explicit") {
    samples(Gen.alphaNumStr.suchThat(s =>
      !Set("text", "number", "decimal", "datetime").contains(s))).foreach { src =>
      assert(Types.isCastExplicit(src, "varchar(10)"))
    }
  }

  test("xlsx colIndex: inverse of bijective base-26 rendering") {
    import graft.sources.Xlsx
    def ref(i: Int): String = {
      var n = i + 1
      val sb = new StringBuilder
      while (n > 0) {
        sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26
      }
      sb.toString
    }
    samples(Gen.chooseNum(0, 16383)).foreach { i =>
      assert(Xlsx.colIndex(ref(i) + "1") == i, ref(i))
    }
  }

  test("xlsx serialToDateTime: day arithmetic and time fractions") {
    import graft.sources.Xlsx
    samples(Gen.chooseNum(61, 60000)).foreach { d =>
      val whole = Xlsx.serialToDateTime(d.toDouble)
      assert(whole.toLocalTime == java.time.LocalTime.MIDNIGHT)
      assert(Xlsx.serialToDateTime(d + 1.0) == whole.plusDays(1))
      assert(Xlsx.serialToDateTime(d + 0.5) == whole.plusHours(12))
    }
  }

  test("xlsx inferType: any string cell forces StringType; integral-only stays Long") {
    import graft.sources.Xlsx
    import org.apache.spark.sql.types._
    val longs = samples(Gen.chooseNum(-1000000L, 1000000L), 50)
      .map(v => Some(Xlsx.Cell('n', v.toString)))
    assert(Xlsx.inferType(longs) == LongType)
    assert(Xlsx.inferType(longs :+ Some(Xlsx.Cell('n', "1.5"))) == DoubleType)
    assert(Xlsx.inferType(longs :+ Some(Xlsx.Cell('s', "x"))) == StringType)
    assert(Xlsx.inferType(longs :+ None) == LongType) // nulls don't demote
  }
}
