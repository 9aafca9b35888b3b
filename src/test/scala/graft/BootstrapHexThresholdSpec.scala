package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the hex-threshold rewrite of q_bootstrap_ci's Poisson
  * inverse-CDF: the former predicate compared `u = value/2³²` (exact in
  * double) against the cumulative thresholds; the optimized plan
  * compares the raw 8-hex-digit substring lexicographically against
  * `hex(⌈t·2³²⌉)`. Equivalence must hold for EVERY 32-bit value, and a
  * one-ulp slip at a boundary would only surface in the oracle gate
  * with probability ~|digests|/2³² — so the boundaries are pinned here
  * exhaustively instead.
  */
class BootstrapHexThresholdSpec extends AnyFunSuite {

  private val t = Seq(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  private def hexK(th: Double): String = {
    val k = (BigDecimal(th) * BigDecimal(2).pow(32))
      .setScale(0, BigDecimal.RoundingMode.CEILING).toBigInt
    f"$k%08x"
  }

  private def hex8(v: Long): String = f"$v%08x"

  test("hex compare ≡ double compare at and around every threshold boundary") {
    t.foreach { th =>
      val k = (BigDecimal(th) * BigDecimal(2).pow(32))
        .setScale(0, BigDecimal.RoundingMode.CEILING).toLongExact
      val hx = hexK(th)
      // exhaustive in the only region where the predicates could
      // disagree, plus the extremes of the 32-bit domain
      val probes = (k - 3 to k + 3) ++ Seq(0L, 1L, (1L << 32) - 1)
      probes.filter(v => v >= 0 && v < (1L << 32)).foreach { v =>
        val uDouble = v.toDouble / math.pow(2.0, 32.0)
        val oldPred = uDouble < th
        val newPred = hex8(v) < hx
        assert(oldPred == newPred,
          s"threshold $th (K=$k): value $v old=$oldPred new=$newPred")
      }
    }
  }

  test("full multiplicity function agrees on a dense value sweep") {
    def mOld(v: Long): Int = {
      val u = v.toDouble / math.pow(2.0, 32.0)
      t.indexWhere(u < _) match { case -1 => 6; case k => k }
    }
    def mNew(v: Long): Int = {
      val h = hex8(v)
      t.map(hexK).indexWhere(h < _) match { case -1 => 6; case k => k }
    }
    // deterministic LCG sweep across the whole domain
    var v = 12345L
    (1 to 200000).foreach { _ =>
      v = (v * 6364136223846793005L + 1442695040888963407L) >>> 32
      assert(mOld(v) == mNew(v), s"value $v: ${mOld(v)} != ${mNew(v)}")
    }
  }

  test("md5 hex is lowercase fixed-width so lexicographic = numeric") {
    // '9' (57) < 'a' (97) in ASCII — the property the string compare
    // relies on; pinned so a future hash/encoding change can't silently
    // break the ordering assumption
    assert("99999999" < "a0000000" && hex8((1L << 32) - 1) == "ffffffff")
  }
}
