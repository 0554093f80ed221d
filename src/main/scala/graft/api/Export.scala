package graft.api

import graft.decompose.{ComponentResult, OaxacaResults}

/** Result export surfaces (S4-S6, `oaxaca_blinder/src/display.rs`):
  * JSON, Markdown, LaTeX, and a console summary. */
object Export {

  private def fmt(x: Double): String =
    if (x.isNaN) "null" else if (x.isInfinite) (if (x > 0) "1e308" else "-1e308")
    else f"$x%.10g"

  private def jsonComp(c: ComponentResult): String =
    s"""{"name": "${c.name}", "estimate": ${fmt(c.estimate)}, """ +
      s""""std_err": ${fmt(c.stdErr)}, "t_stat": ${fmt(c.tStat)}, """ +
      s""""p_value": ${fmt(c.pValue)}, "ci_lower": ${fmt(c.ciLower)}, """ +
      s""""ci_upper": ${fmt(c.ciUpper)}}"""

  /** Pretty JSON with the reference's result shape (total gap, two-fold
    * aggregate + detailed, three-fold aggregate, counts). */
  def toJson(r: OaxacaResults): String = {
    def arr(cs: Seq[ComponentResult]) =
      cs.map(jsonComp).mkString("[", ",\n      ", "]")
    s"""{
       |  "total_gap": ${fmt(r.totalGap)},
       |  "n_a": ${r.nA},
       |  "n_b": ${r.nB},
       |  "group_a": "${r.groupALevel}",
       |  "group_b": "${r.groupBLevel}",
       |  "two_fold": {
       |    "aggregate": ${arr(r.twoFold)},
       |    "detailed_explained": ${arr(r.detailedExplained)},
       |    "detailed_unexplained": ${arr(r.detailedUnexplained)},
       |    "detailed_selection": ${arr(r.detailedSelection)}
       |  },
       |  "three_fold": {
       |    "aggregate": ${arr(r.threeFold)}
       |  }
       |}""".stripMargin
  }

  /** Markdown table (`display.rs:115-132`). */
  def toMarkdown(r: OaxacaResults): String = {
    val sb = new StringBuilder
    sb.append("### Oaxaca-Blinder Decomposition Results\n\n")
    sb.append("| Component | Estimate | Std. Err. | p-value | 95% CI |\n")
    sb.append("|---|---|---|---|---|\n")
    r.twoFold.foreach { c =>
      sb.append(f"| ${c.name} | ${c.estimate}%.4f | ${c.stdErr}%.4f | " +
        f"${c.pValue}%.4f | [${c.ciLower}%.3f, ${c.ciUpper}%.3f] |\n")
    }
    sb.toString
  }

  /** LaTeX table (`display.rs:84-113`). */
  def toLatex(r: OaxacaResults): String = {
    val sb = new StringBuilder
    sb.append("\\begin{table}[ht]\n\\centering\n\\begin{tabular}{lcccc}\n\\hline\n")
    sb.append("Component & Estimate & Std. Err. & p-value & 95\\% CI \\\\\n\\hline\n")
    sb.append("\\multicolumn{5}{l}{\\textit{Two-Fold Decomposition}} \\\\\n")
    r.twoFold.foreach { c =>
      sb.append(f"${c.name} & ${c.estimate}%.4f & ${c.stdErr}%.4f & " +
        f"${c.pValue}%.4f & [${c.ciLower}%.3f, ${c.ciUpper}%.3f] \\\\\n")
    }
    sb.append("\\hline\n\\end{tabular}\n")
    sb.append("\\caption{Oaxaca-Blinder Decomposition Results}\n")
    sb.append("\\label{tab:oaxaca_results}\n\\end{table}\n")
    sb.toString
  }

  /** Standalone HTML report (S7, the reference's askama template
    * `templates/report.html` rendered via `main.rs:320-370`). */
  def toHtml(r: OaxacaResults): String = {
    def rows(cs: Seq[ComponentResult]) = cs.map(c =>
      f"<tr><td>${c.name}</td><td>${c.estimate}%.4f</td>" +
        f"<td>${c.stdErr}%.4f</td><td>${c.pValue}%.4f</td>" +
        f"<td>[${c.ciLower}%.3f, ${c.ciUpper}%.3f]</td></tr>").mkString("\n")
    def table(title: String, cs: Seq[ComponentResult]) =
      if (cs.isEmpty) ""
      else s"""<h2>$title</h2>
         |<table border="1" cellpadding="4" cellspacing="0">
         |<tr><th>Component</th><th>Estimate</th><th>Std. Err.</th>
         |<th>p-value</th><th>95% CI</th></tr>
         |${rows(cs)}
         |</table>""".stripMargin
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8">
       |<title>Oaxaca-Blinder Decomposition Report</title></head>
       |<body>
       |<h1>Oaxaca-Blinder Decomposition Report</h1>
       |<p>Total gap (${r.groupALevel} &minus; ${r.groupBLevel}):
       |<b>${f"${r.totalGap}%.6f"}</b> &nbsp; n<sub>a</sub>=${r.nA}
       |n<sub>b</sub>=${r.nB}</p>
       |${table("Two-Fold Decomposition", r.twoFold)}
       |${table("Three-Fold Decomposition", r.threeFold)}
       |${table("Detailed (Explained)", r.detailedExplained)}
       |${table("Detailed (Unexplained)", r.detailedUnexplained)}
       |${table("Detailed (Selection)", r.detailedSelection)}
       |</body></html>""".stripMargin
  }

  /** Plain-English interpretation, mirroring the Python binding's
    * `interpret()` (`oaxaca_blinder/src/python.rs:159-185`) — same
    * sentences and rounding. */
  def interpret(r: OaxacaResults): String = {
    val explained = r.twoFold.find(_.name == "explained").map(_.estimate).getOrElse(0.0)
    val unexplained = r.twoFold.find(_.name == "unexplained").map(_.estimate).getOrElse(0.0)
    val total = r.totalGap
    val expPct = explained / total * 100.0
    val unexpPct = unexplained / total * 100.0
    if (!java.lang.Double.isFinite(expPct) || !java.lang.Double.isFinite(unexpPct))
      f"The total gap is $total%.4f; the percentage breakdown is " +
        "undefined for a zero gap."
    else
      f"The total gap is $total%.4f. \n" +
        f"$expPct%.1f%% of this gap is explained by differences in endowments (observables), " +
        f"while $unexpPct%.1f%% is unexplained (coefficients/discrimination)."
  }

  /** Self-contained SVG bar chart of the two-fold decomposition — the
    * dependency-free counterpart of the Python binding's matplotlib
    * `plot(kind="bar")` (`python.rs:126-157`). Embeds directly in the
    * S7 HTML report or any browser. */
  def toSvgBar(r: OaxacaResults): String = {
    val explained = r.twoFold.find(_.name == "explained").map(_.estimate).getOrElse(0.0)
    val unexplained = r.twoFold.find(_.name == "unexplained").map(_.estimate).getOrElse(0.0)
    val values = Seq("Explained" -> explained, "Unexplained" -> unexplained)
    val maxAbs = math.max(values.map(v => math.abs(v._2)).max, 1e-12)
    val (w, h, pad) = (360, 240, 36)
    val zeroY = h / 2
    val scale = (h / 2 - pad).toDouble / maxAbs
    val barW = 90
    val bars = values.zipWithIndex.map { case ((label, v), i) =>
      val x = pad + i * (barW + 60)
      val bh = math.abs(v) * scale
      val y = if (v >= 0) zeroY - bh else zeroY.toDouble
      f"""<rect x="$x" y="$y%.1f" width="$barW" height="$bh%.1f" fill="${if (i == 0) "#4472c4" else "#ed7d31"}"/>
         |<text x="${x + barW / 2}" y="${h - 8}" text-anchor="middle" font-size="12">$label</text>
         |<text x="${x + barW / 2}" y="${if (v >= 0) y - 4 else y + bh + 14}%.1f" text-anchor="middle" font-size="11">$v%.4f</text>""".stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h">
       |<text x="${w / 2}" y="16" text-anchor="middle" font-size="14">Oaxaca-Blinder Decomposition</text>
       |<line x1="0" y1="$zeroY" x2="$w" y2="$zeroY" stroke="#888"/>
       |$bars
       |</svg>""".stripMargin
  }

  /** Console summary (`display.rs:7-79`). */
  def summary(r: OaxacaResults): String = {
    val sb = new StringBuilder
    sb.append("=== Oaxaca-Blinder Decomposition ===\n")
    sb.append(f"Total gap (${r.groupALevel} - ${r.groupBLevel}): ${r.totalGap}%.6f   ")
    sb.append(s"n_a=${r.nA} n_b=${r.nB}\n\n")
    def block(title: String, cs: Seq[ComponentResult]): Unit = if (cs.nonEmpty) {
      sb.append(title + "\n")
      sb.append(f"${"component"}%-22s ${"estimate"}%12s ${"std_err"}%12s " +
        f"${"p_value"}%9s ${"ci_lower"}%12s ${"ci_upper"}%12s\n")
      cs.foreach { c =>
        sb.append(f"${c.name}%-22s ${c.estimate}%12.4f ${c.stdErr}%12.4f " +
          f"${c.pValue}%9.4f ${c.ciLower}%12.4f ${c.ciUpper}%12.4f\n")
      }
      sb.append("\n")
    }
    block("Two-fold decomposition:", r.twoFold)
    block("Three-fold decomposition:", r.threeFold)
    block("Detailed (explained):", r.detailedExplained)
    block("Detailed (unexplained):", r.detailedUnexplained)
    block("Detailed (selection):", r.detailedSelection)
    sb.toString
  }
}
