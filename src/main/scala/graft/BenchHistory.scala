package graft

/** Committed-history yardsticks for the bench's outlier defense: per-query
  * median seconds and median calibs across every full run recorded in
  * BENCH_HISTORY.jsonl. Parsed with regexes rather than a JSON library —
  * the lines are machine-written by [[Bench]] itself (flat keys, numeric
  * values, no escapes), and the build intentionally has no JSON dependency.
  */
final case class BenchHistory(
    perQuery: Map[String, Seq[Double]],
    calibs: Seq[Double],
    calibIos: Seq[Double]) {

  private def med(xs: Seq[Double]): Option[Double] = {
    if (xs.isEmpty) None
    else {
      val s = xs.sorted
      Some(if (s.size % 2 == 1) s(s.size / 2)
           else (s(s.size / 2 - 1) + s(s.size / 2)) / 2)
    }
  }

  def queryMedian(name: String): Option[Double] =
    perQuery.get(name).flatMap(v => med(v.filter(_ >= 0)))
  def calibMedian: Option[Double] = med(calibs)
  def calibIoMedian: Option[Double] = med(calibIos)
}

object BenchHistory {
  private val QueriesRe = """"queries":\{([^}]*)\}""".r
  private val EntryRe = """"([^"]+)":(-?[0-9.eE+-]+)""".r
  private val CalibRe = """"calib":(-?[0-9.eE+]+)""".r
  private val CalibIoRe = """"calib_io":(-?[0-9.eE+]+)""".r

  def load(path: String): BenchHistory = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isRegularFile(p)) return BenchHistory(Map.empty, Nil, Nil)
    val lines = java.nio.file.Files.readAllLines(p)
    val perQuery = scala.collection.mutable.Map.empty[String, List[Double]]
    val calibs = List.newBuilder[Double]
    val calibIos = List.newBuilder[Double]
    lines.forEach { line =>
      QueriesRe.findFirstMatchIn(line).foreach { qm =>
        EntryRe.findAllMatchIn(qm.group(1)).foreach { e =>
          val v = try e.group(2).toDouble catch { case _: NumberFormatException => -1.0 }
          if (v >= 0) perQuery.updateWith(e.group(1))(o => Some(v :: o.getOrElse(Nil)))
        }
      }
      CalibRe.findFirstMatchIn(line).foreach(m => calibs += m.group(1).toDouble)
      CalibIoRe.findFirstMatchIn(line).foreach(m => calibIos += m.group(1).toDouble)
    }
    BenchHistory(perQuery.view.mapValues(_.toSeq).toMap, calibs.result(), calibIos.result())
  }
}
