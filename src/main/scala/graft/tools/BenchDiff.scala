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

  private[graft] def flag(prevJson: String, currJson: String,
                          ratioGate: Double, spreadGate: Double)
      : Seq[(String, Double, Double, Double, Double)] = {
    val pq = mapOf(prevJson, "queries")
    val cq = mapOf(currJson, "queries")
    // the complete spread map is the current run's (bench_out.json
    // writes it at min_pct 0); a missing entry means spread 0 — flag
    val spread = mapOf(currJson, "spread_pct")
    cq.toSeq.sortBy(_._1).flatMap { case (k, c) =>
      pq.get(k) match {
        case Some(p) if p > 0 && c > 0 && c / p > ratioGate &&
            spread.getOrElse(k, 0.0) < spreadGate =>
          Some((k, p, c, c / p, spread.getOrElse(k, 0.0)))
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
    val rows = flagged.map { case (k, p, c, r, s) =>
      f"""    "$k": {"prev_sec": $p%.3f, "curr_sec": $c%.3f, """ +
        f""""ratio": $r%.2f, "spread_pct": $s%.1f}"""
    }.mkString(",\n")
    val json =
      s"""{
         |  "prev": "${args(0)}",
         |  "curr": "${args(1)}",
         |  "ratio_gate": 1.3,
         |  "spread_gate_pct": 50.0,
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
      flagged.foreach { case (k, p, c, r, s) =>
        println(f"[benchdiff]   $k: $p%.2f -> $c%.2f s " +
          f"(${r}%.2fx, spread $s%.1f%%)")
      }
    }
  }
}
