package graft

import graft.analytics.EvalOps

/** Hand-computed fixtures for the evaluation / robust-statistics
  * operators: every expected value is derived on paper from the
  * documented integer micros/ppm arithmetic, including the floors the
  * declared queries can't isolate (per-bin gap before ECE, per-class
  * recall before balanced accuracy, the TVD half-sum).
  */
class EvalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("agreement report replays the textbook 2x2 kappa example") {
    // cells: (a,a)=20 (a,b)=5 (b,a)=10 (b,b)=15 → n=50, agree=35
    // pe_num = 25·30 + 25·20 = 1250; kappa = (1750-1250)e6/1250 = 400000
    // recalls 800000/600000 → bal acc 700000
    // MCC(a): tp=20 fp=10 fn=5 tn=15; num=250; den=30·25·25·20=375000
    //   → mcc2 = 250²·1e6 DIV 375000 = 166666
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = EvalOps.agreementReport(rows.toDF("act", "pred"), posClass = "a")
      .collect().head
    assert(r.getAs[Long]("n") === 50L)
    assert(r.getAs[Long]("agree") === 35L)
    assert(r.getAs[Long]("accuracy_micros") === 700000L)
    assert(r.getAs[Long]("kappa_micros") === 400000L)
    assert(r.getAs[Long]("bal_acc_micros") === 700000L)
    assert(r.getAs[Long]("mcc_sign") === 1L)
    assert(r.getAs[Long]("mcc2_micros") === 166666L)
  }

  test("agreement single-class degenerate hits the kappa guard, not ÷0") {
    // all act = pred = 'a': pe_num = n², denominator guard → kappa 0
    val r = EvalOps.agreementReport(
      Seq.fill(4)(("a", "a")).toDF("act", "pred"), posClass = "a").collect().head
    assert(r.getAs[Long]("accuracy_micros") === 1000000L)
    assert(r.getAs[Long]("kappa_micros") === 0L)
    assert(r.getAs[Long]("mcc_sign") === 0L) // tn = 0 → num = 0
  }

  test("spearman: ties and the centered doubled-rank arithmetic") {
    // x=(1,1,2) y=(1,2,3): ex=(-1,-1,2), ey=(-2,0,2)
    // sxy=6 sxx=6 syy=8 → rho2 = 36e6 DIV 48 = 750000, sign +
    val df = Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 2L, 3L)).toDF("g", "x", "y")
    val r = EvalOps.spearmanMicros(df, "g", "x", "y").collect().head
    assert(r.getAs[Long]("sum_ex") === 0L) // centering certificate
    assert(r.getAs[Long]("sum_ey") === 0L)
    assert(r.getAs[Long]("rho_sign") === 1L)
    assert(r.getAs[Long]("rho2_micros") === 750000L)
  }

  test("spearman is 1 for any monotone map and -1 reversed") {
    val up = Seq(("g", 1L, 1L), ("g", 2L, 4L), ("g", 3L, 9L)).toDF("g", "x", "y")
    val ru = EvalOps.spearmanMicros(up, "g", "x", "y").collect().head
    assert(ru.getAs[Long]("rho_sign") === 1L)
    assert(ru.getAs[Long]("rho2_micros") === 1000000L)
    val dn = Seq(("g", 1L, 9L), ("g", 2L, 4L), ("g", 3L, 1L)).toDF("g", "x", "y")
    val rd = EvalOps.spearmanMicros(dn, "g", "x", "y").collect().head
    assert(rd.getAs[Long]("rho_sign") === -1L)
    assert(rd.getAs[Long]("rho2_micros") === 1000000L)
  }

  test("calibration bins, per-bin floors, and the ECE row") {
    val scored = Seq((50000L, true), (150000L, false), (150000L, true),
      (950000L, true), (1000000L, true)).toDF("score_ppm", "pos")
    val out = EvalOps.calibrationReport(scored).orderBy("bin").collect()
    val bins = out.map(r => r.getAs[Long]("bin") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("mean_score_ppm"),
        r.getAs[Long]("pos_ppm"), r.getAs[Long]("gap_ppm"))).toMap
    assert(bins(0L) === ((1L, 50000L, 1000000L, 950000L)))
    assert(bins(1L) === ((2L, 150000L, 500000L, 350000L)))
    assert(bins(9L) === ((2L, 975000L, 1000000L, 25000L))) // 1e6 clamps into bin 9
    // zz: mean = 2300000 DIV 5, pos = 4e6 DIV 5, ECE = 1700000 DIV 5
    assert(bins(999L) === ((5L, 460000L, 800000L, 340000L)))
  }

  test("winsorized/trimmed means at nearest-rank p10/p90 on 1..10") {
    // klo = ceil(1) = 1 → lo = 1; khi = ceil(9) = 9 → hi = 9
    // winsorized sum = 55 - 10 + 9 = 54; trimmed = mean(1..9) = 5
    val df = (1L to 10L).map(("g", _)).toDF("g", "x")
    val r = EvalOps.winsorizedMeans(df, "g", "x", pLo = 10, pHi = 90).collect().head
    assert(r.getAs[Long]("lo") === 1L)
    assert(r.getAs[Long]("hi") === 9L)
    assert(r.getAs[Long]("wins_mean_micros") === 5400000L)
    assert(r.getAs[Long]("trim_n") === 9L)
    assert(r.getAs[Long]("trim_mean_micros") === 5000000L)
  }

  test("benford audit: observed ppm, absent digits, and the TVD row") {
    // digits: 1×3 (1,10,19), 2×2 (2,25), 9×1 (9); n = 6
    val df = Seq(1L, 10L, 19L, 2L, 25L, 9L).toDF("x")
    val out = EvalOps.benfordAudit(df, "x").orderBy("d").collect()
    val by = out.map(r => r.getAs[String]("d") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("obs_ppm"), r.getAs[Long]("dev_ppm"))).toMap
    assert(by("1") === ((3L, 500000L, 198970L)))
    assert(by("2") === ((2L, 333333L, 157242L)))
    assert(by("9") === ((1L, 166666L, 120909L)))
    assert(by("3")._1 === 0L) // absent digit still emits a row
    assert(by("3")._3 === 124939L)
    // TVD = (198970+157242+120909+477122) DIV 2
    assert(by("zz") === ((6L, 1000000L, 477121L)))
    // the nine Benford ppm literals partition 1e6 exactly
    assert(EvalOps.benfordPpm.map(_._2).sum === 1000000L)
  }

  test("eval operators tolerate null text/lang and empty inputs") {
    // null-feature rows: spearman/winsorize must not throw; benford
    // skips nulls and non-positives by contract
    val r = EvalOps.winsorizedMeans(
      Seq(("g", Option(5L)), ("g", Option.empty[Long])).toDF("g", "x"), "g", "x")
      .collect().head
    assert(r.getAs[Long]("n") === 1L)
    val b = EvalOps.benfordAudit(
      Seq(Option(7L), Option.empty[Long], Option(0L)).toDF("x"), "x")
      .filter("d = 'zz'").collect().head
    assert(b.getAs[Long]("n_docs") === 1L)
  }
}
