package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Fnv1a64Helper

/** ScalaCheck properties for the pure conversion kernels (SURVEY §5's
  * mapping: property tests for F3-F5 + hash stability). Runs under sbt's
  * native ScalaCheck framework — no Spark session needed. */
object ConversionProps extends Properties("conversions") {

  // F3 microTimestampToMillis: integer division, consistent with ns path
  property("micros->millis agrees with nanos->millis for positive times") =
    forAll(Gen.chooseNum(0L, 4102444800000000L)) { us =>
      val ns = us * 1000
      (us / 1000) == (ns / 1000000)
    }

  property("micros->millis truncates toward zero for positives") =
    forAll(Gen.chooseNum(0L, Long.MaxValue / 1000)) { us =>
      val ms = us / 1000
      ms * 1000 <= us && us - ms * 1000 < 1000
    }

  // F5 money normalization: 2-dp rounding is idempotent and order-stable
  private def round2(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  property("round2 is idempotent") =
    forAll(Gen.chooseNum(-1e9, 1e9)) { x => round2(round2(x)) == round2(x) }

  property("round2 of exact 2-dp values is identity") =
    forAll(Gen.chooseNum(-100000000L, 100000000L)) { cents =>
      val x = cents / 100.0
      round2(x) == x
    }

  // FNV-1a 64: stability + avalanche sanity
  property("fnv1a64 is deterministic") =
    forAll { (s: String) =>
      Fnv1a64Helper.hashBytes(s.getBytes("UTF-8")) ==
        Fnv1a64Helper.hashBytes(s.getBytes("UTF-8"))
    }

  property("fnv1a64 distinguishes appended bytes") =
    forAll { (s: String) =>
      Fnv1a64Helper.hashBytes(s.getBytes("UTF-8")) !=
        Fnv1a64Helper.hashBytes((s + "x").getBytes("UTF-8"))
    }
}
