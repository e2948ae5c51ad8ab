package graft

import graft.sources.IosFileParser
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz discipline for the IOS reader's pure parsing kernels: malformed
  * input must fail FAST and CONTROLLED (a JVM exception from the
  * documented family, within a time bound) — never hang, recurse
  * without bound, or allocate proportionally to a hostile descriptor.
  * A source that ingests 100 TB of third-party files meets every
  * corruption eventually; the failure mode is part of the contract.
  */
class IosFuzzSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: $res")
  }

  test("parseFortranFormat on garbage: controlled exception or parse, never a hang") {
    val junk = Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf('(', ')', ',', 'F', 'I', 'A', 'E', 'X', '.', '1', '2', '9', '0'),
      1 -> Gen.asciiPrintableChar)).map(_.mkString)
    check("fortran-fuzz", Prop.forAll(junk) { s =>
      val t0 = System.nanoTime()
      val ok = try { IosFileParser.parseFortranFormat(s); true }
      catch {
        case _: IllegalArgumentException => true // the documented failure
        case _: StackOverflowError => false
        case _: OutOfMemoryError => false
      }
      ok && (System.nanoTime() - t0) < 1000000000L
    })
  }

  test("hostile repeat counts cannot allocate unbounded descriptor vectors") {
    // "(999999999(F8.2))"-style bombs: the parser expands repeat groups
    // into a segment vector — a naive expansion of a hostile count would
    // OOM before any data is read
    val bomb = Gen.oneOf(
      Gen.chooseNum(1000, Int.MaxValue).map(n => s"($n(F8.2,I4))"), // repeat bomb
      Gen.chooseNum(100000, 9999999).map(w => s"(100A$w)"), // width bomb
      Gen.chooseNum(100000, 9999999).map(w => s"(${w}X,F8.2)"), // skip-width bomb
      Gen.const("(9999(999(9(F9.2))))")) // nested product bomb
    check("repeat-bomb", Prop.forAll(bomb) { fmt =>
      try { IosFileParser.parseFortranFormat(fmt); () }
      catch { case _: IllegalArgumentException => () }
      true // reaching here within the property run means no OOM/hang
    })
  }

  test("parseIosTime on garbage never throws — absent is None") {
    val junk = Gen.listOf(Gen.frequency(
      5 -> Gen.oneOf("2019", "/", ":", " ", "12", "60", "99", ".", "-"),
      1 -> Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)))
      .map(_.mkString)
    check("time-fuzz", Prop.forAll(junk) { s =>
      IosFileParser.parseIosTime(s).isInstanceOf[Option[_]]
    })
  }

  test("whole-file parse on mutated headers: controlled failure only") {
    val section = Gen.oneOf("*FILE", "*LOCATION", "*INSTRUMENT", "*HISTORY",
      "*END OF HEADER", "$TABLE: CHANNELS", "$END", "!", "random junk")
    val line = for {
      s <- section
      tail <- Gen.listOf(Gen.oneOf("NUMBER OF RECORDS: 2", "abc : def",
        "1 2 3", "", "FORMAT: (2F8.2)")).map(_.mkString("\n"))
    } yield s + "\n" + tail
    val doc = Gen.listOf(line).map(_.mkString("\n"))
    check("header-fuzz", Prop.forAll(doc) { content =>
      try { IosFileParser.parse("fuzz.bot", content); true }
      catch {
        case _: IllegalArgumentException | _: NumberFormatException |
             _: NoSuchElementException | _: java.time.DateTimeException => true
        case _: StackOverflowError | _: OutOfMemoryError => false
      }
    })
  }
}
