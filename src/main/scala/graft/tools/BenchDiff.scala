package graft.tools

import java.nio.file.{Files, Paths}

/** Bench regression autodiff — the r15 verdict's ask: the q157/q154
  * manifest-overhead regression was only caught by hand-diffing
  * per-query seconds against numbers that survived in prose. This
  * makes the diff an ARTIFACT: compare two bench JSON lines
  * (`BENCH_r{N-1}.json` vs the current `bench_out.json`), flag every
  * query whose time grew past the ratio gate AND whose published
  * spread is small enough that the growth is signal, not noise
  * (a >1.3× move inside a >50% spread band is measurement), and write
  * the flagged list as `BENCH_DIFF_r{N}.json` — empty `flagged` is a
  * pass. No Spark session involved; the JSON shapes are the bench's
  * own flat maps, parsed with a deliberately minimal extractor.
  *
  * Usage: runMain graft.tools.BenchDiff <prev.json> <curr.json> [out]
  * Exit code stays 0 either way — the artifact is the signal; the
  * driver's bench gate stays authoritative.
  */
object BenchDiff {

  private[graft] def mapOf(json: String,
                           key: String): Map[String, Double] = {
    val i = ("\"" + key + "\"\\s*:\\s*\\{").r
      .findFirstMatchIn(json).map(_.start).getOrElse(return Map.empty)
    val start = json.indexOf('{', i)
    val end = json.indexOf('}', start)
    if (end < 0) return Map.empty
    "\"([^\"]+)\"\\s*:\\s*(-?[0-9.]+)".r
      .findAllMatchIn(json.substring(start + 1, end))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  private[graft] def scalarOf(json: String, key: String): Option[Double] =
    ("\"" + key + "\"\\s*:\\s*(-?[0-9.]+)").r
      .findFirstMatchIn(json).map(_.group(1).toDouble)

  /** One flagged row: name, prev s, curr s, raw ratio, drift-normalized
    * ratio, current spread %, current draws. */
  private[graft] final case class Flagged(name: String, prev: Double,
      curr: Double, ratio: Double, normRatio: Double, spread: Double,
      draws: Int)

  /** r20 changes (r19 ADVICE + VERDICT item 3): (a) the compared ratio
    * is DRIFT-NORMALIZED — each run publishes `box_drift` (its median
    * draw/anchored-floor ratio), and dividing the raw ratio by the
    * drift ratio removes uniform box-era movement so the 1.3× gate
    * measures the PLAN again, not the box (r20's diff flagged 37 rows,
    * all box/methodology drift); files without the field default to
    * drift 1.0; (b) a one-draw row's published spread of 0.0 is not
    * evidence — the old <50%-spread filter treated it as
    * high-confidence signal. One-draw rows now flag only past a
    * stricter 1.6× normalized gate and carry draws in the output so
    * adjudication sees the sample size.
    */
  /** The drift basis actually divided out of the ratios (r21, VERDICT
    * item 2 + r20 ADVICE): the MINIMUM of up to three estimates — the
    * published box_drift ratio (contention-sensitive, over-forgave by
    * ~50% in r20: probe 3.09 vs matched-median 2.07), the matched-query
    * MEDIAN ratio (self-normalization on the stable fleet), and the
    * q00x_drift_probe row's own ratio (pure-Spark synthetic work,
    * the ONLY estimate a uniform plan regression cannot contaminate —
    * the fleet-derived bases both rise with an across-the-board code
    * slowdown and would forgive it). Taking the min normalizes away
    * the least movement, so every flag decision uses the most
    * conservative (most-flagging) defensible basis. All bases clamp
    * at 1 for the r20 review-fix reason (floor-seeking published
    * values do not scale below their floors).
    */
  private[graft] def driftBases(prevJson: String, currJson: String)
      : Map[String, Double] = {
    val pq = mapOf(prevJson, "queries")
    val cq = mapOf(currJson, "queries")
    val box = math.max(1.0,
      scalarOf(currJson, "box_drift").getOrElse(1.0) /
        scalarOf(prevJson, "box_drift").getOrElse(1.0))
    val matched = cq.toSeq.flatMap { case (k, c) =>
      pq.get(k).filter(p => p > 0 && c > 0).map(c / _) }
    val self =
      if (matched.isEmpty) None
      else Some(math.max(1.0, matched.sorted.apply(matched.size / 2)))
    val probe = for {
      p <- pq.get("q00x_drift_probe").filter(_ > 0)
      c <- cq.get("q00x_drift_probe").filter(_ > 0)
    } yield math.max(1.0, c / p)
    Map("box" -> Some(box), "self" -> self, "probe" -> probe)
      .collect { case (k, Some(v)) => k -> v }
  }

  private[graft] def flag(prevJson: String, currJson: String,
                          ratioGate: Double, spreadGate: Double,
                          precomputedBases: Map[String, Double] = null)
      : Seq[Flagged] = {
    val pq = mapOf(prevJson, "queries")
    val cq = mapOf(currJson, "queries")
    // the complete spread map is the current run's (bench_out.json
    // writes it at min_pct 0)
    val spread = mapOf(currJson, "spread_pct")
    val draws = mapOf(currJson, "draws")
    // main() passes its bases through so the published drift_ratio is
    // BY CONSTRUCTION the one the flags were gated on (review fix)
    val bases = Option(precomputedBases)
      .getOrElse(driftBases(prevJson, currJson))
    val driftRatio = bases.values.min
    // loud disagreement warning (r20 ADVICE): when the fleet-derived
    // bases sit far above the code-independent probe, the difference
    // is either heterogeneous contention or a uniform plan regression
    // — adjudication must look either way
    if (bases.size > 1 && bases.values.max / bases.values.min > 1.15)
      System.err.println("[benchdiff] WARNING: drift estimates " +
        s"disagree > 15% (${bases.map { case (k, v) =>
          f"$k=$v%.2f" }.mkString(", ")}) — normalizing by the min; " +
        "if box drift alone explains the gap, flagged rows need " +
        "ABA adjudication, if not, suspect an across-the-board " +
        "plan regression")
    cq.toSeq.sortBy(_._1).flatMap { case (k, c) =>
      pq.get(k) match {
        case Some(p) if p > 0 && c > 0 =>
          val n = draws.get(k).map(_.toInt).getOrElse(3)
          val raw = c / p
          val norm = raw / math.max(driftRatio, 0.01)
          val gate = if (n <= 1) math.max(ratioGate, 1.6) else ratioGate
          // sub-second rows (r21, VERDICT item 3): a <1 s row's timing
          // on a cold/drifted box measures JVM and page-cache state,
          // not the plan — r20 published 24,971% spreads on such rows.
          // Spread is NOT evidence either way there; they flag only on
          // ABSOLUTE excess (≥ 1 s of real growth past the normalized
          // prior), never on ratio alone.
          val subSecond = p < 1.0
          val flagged =
            if (subSecond) norm > gate && c - p * driftRatio >= 1.0
            else norm > gate && spread.getOrElse(k, 0.0) < spreadGate
          if (flagged)
            Some(Flagged(k, p, c, raw, norm, spread.getOrElse(k, 0.0), n))
          else None
        case _ => None
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchDiff <prev.json> <curr.json> [out.json]")
    val out = if (args.length > 2) args(2) else "BENCH_DIFF.json"
    val prev = Files.readString(Paths.get(args(0)))
    val curr = Files.readString(Paths.get(args(1)))
    val bases = driftBases(prev, curr)
    val flagged = flag(prev, curr, ratioGate = 1.3, spreadGate = 50.0,
      precomputedBases = bases)
    val driftRatio = bases.values.min
    val rows = flagged.map { f =>
      f"""    "${f.name}": {"prev_sec": ${f.prev}%.3f, "curr_sec": ${
        f.curr}%.3f, "ratio": ${f.ratio}%.2f, "norm_ratio": ${
        f.normRatio}%.2f, "spread_pct": ${f.spread}%.1f, "draws": ${
        f.draws}%d}"""
    }.mkString(",\n")
    val json =
      f"""{
         |  "prev": "${args(0)}",
         |  "curr": "${args(1)}",
         |  "ratio_gate": 1.3,
         |  "one_draw_ratio_gate": 1.6,
         |  "spread_gate_pct": 50.0,
         |  "drift_ratio": $driftRatio%.2f,
         |  "drift_bases": {${bases.toSeq.sorted.map { case (k, v) =>
                f""""$k": $v%.2f""" }.mkString(", ")}},
         |  "flagged_count": ${flagged.size},
         |  "flagged": {
         |$rows
         |  }
         |}
         |""".stripMargin
    Files.writeString(Paths.get(out), json)
    if (flagged.isEmpty)
      println(s"[benchdiff] PASS: no low-noise regressions > 1.3x -> $out")
    else {
      println(s"[benchdiff] ${flagged.size} flagged -> $out")
      flagged.foreach { f =>
        println(f"[benchdiff]   ${f.name}: ${f.prev}%.2f -> ${f.curr}%.2f s " +
          f"(${f.ratio}%.2fx raw, ${f.normRatio}%.2fx drift-normalized, " +
          f"spread ${f.spread}%.1f%%, ${f.draws}%d draws)")
      }
    }
  }
}
