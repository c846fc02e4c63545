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
  private[graft] def flag(prevJson: String, currJson: String,
                          ratioGate: Double, spreadGate: Double)
      : Seq[Flagged] = {
    val pq = mapOf(prevJson, "queries")
    val cq = mapOf(currJson, "queries")
    // the complete spread map is the current run's (bench_out.json
    // writes it at min_pct 0)
    val spread = mapOf(currJson, "spread_pct")
    val draws = mapOf(currJson, "draws")
    // CLAMPED at 1 (review fix): published values are floor-seeking
    // (retry-pass mins), so they do NOT scale linearly with box_drift
    // — after a drifted round recovers, an unclamped ratio < 1 would
    // INFLATE unchanged rows past the gates and mass-flag a clean
    // round. Dividing out drift only in the drifted-curr direction
    // keeps the correction where it is conservative.
    val driftRatio = math.max(1.0,
      scalarOf(currJson, "box_drift").getOrElse(1.0) /
        scalarOf(prevJson, "box_drift").getOrElse(1.0))
    cq.toSeq.sortBy(_._1).flatMap { case (k, c) =>
      pq.get(k) match {
        case Some(p) if p > 0 && c > 0 =>
          val n = draws.get(k).map(_.toInt).getOrElse(3)
          val raw = c / p
          val norm = raw / math.max(driftRatio, 0.01)
          val gate = if (n <= 1) math.max(ratioGate, 1.6) else ratioGate
          if (norm > gate && spread.getOrElse(k, 0.0) < spreadGate)
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
    val flagged = flag(prev, curr, ratioGate = 1.3, spreadGate = 50.0)
    val driftRatio = math.max(1.0,
      scalarOf(curr, "box_drift").getOrElse(1.0) /
        scalarOf(prev, "box_drift").getOrElse(1.0))
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
