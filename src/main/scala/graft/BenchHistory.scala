package graft

/** Committed-history yardsticks for the bench's outlier defense: per-query
  * median seconds and median calibs across every full run recorded in
  * BENCH_HISTORY.jsonl. Parsed with regexes rather than a JSON library —
  * the lines are machine-written by [[Bench]] itself (flat keys, numeric
  * values, no escapes), and the build intentionally has no JSON dependency.
  */
final case class BenchHistory(
    perQuery: Map[String, Seq[Double]],
    sf1PerQuery: Map[String, Seq[Double]],
    calibs: Seq[Double],
    calibIos: Seq[Double],
    calibMts: Seq[Double] = Nil,
    dispersions: Seq[Double] = Nil,
    calibShuffles: Seq[Double] = Nil) {

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
  /** Median committed sf1-probe seconds for a SHORT query key ("q74"). */
  def sf1Median(shortName: String): Option[Double] =
    sf1PerQuery.get(shortName).flatMap(v => med(v.filter(_ >= 0)))
  def calibMedian: Option[Double] = med(calibs)
  def calibIoMedian: Option[Double] = med(calibIos)
  def calibMtMedian: Option[Double] = med(calibMts)
  def calibShuffleMedian: Option[Double] = med(calibShuffles)
  def dispersionMedian: Option[Double] = med(dispersions)
}

object BenchHistory {
  // The MAIN per-query map is the flat {"name":num,...} one. A history line
  // carries a SECOND, earlier "queries" key inside its "sf1" block whose
  // values are nested objects — [^}]* style matching latched onto that one
  // and silently emptied the per-query history whenever an sf1 block was
  // present (found in round 9); this regex only matches the flat shape.
  // Full signed-exponent number pattern everywhere: a character-class like
  // [0-9.eE+] cannot match a NEGATIVE exponent (1.2E-4 — which
  // Double.toString emits for any value < 1e-3), and one such value used
  // to silently empty the whole flat-queries group for that line — the
  // same silent-empty failure mode the round-9 regex fix addressed.
  private val Num = """-?[0-9.]+(?:[eE][+-]?[0-9]+)?"""
  private val QueriesRe = ("\"queries\":\\{((?:\"[^\"]+\":" + Num + ",?)+)\\}").r
  // sf1-probe entries are the nested {"sf01":..,"sf1":..,"ratio":..} shape;
  // no closing-brace anchor, so later-appended fields (n, hist) still parse.
  private val Sf1EntryRe =
    ("\"(q[0-9]+[a-z]*)\":\\{\"sf01\":(" + Num + "),\"sf1\":(" + Num +
      "),\"ratio\":(" + Num + ")").r
  private val EntryRe = ("\"([^\"]+)\":(" + Num + ")").r
  private val CalibRe = ("\"calib\":(" + Num + ")").r
  private val CalibIoRe = ("\"calib_io\":(" + Num + ")").r
  private val CalibMtRe = ("\"calib_mt\":(" + Num + ")").r
  private val CalibShuffleRe = ("\"calib_shuffle\":(" + Num + ")").r
  private val DispersionRe = ("\"dispersion\":(" + Num + ")").r

  def load(path: String): BenchHistory = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isRegularFile(p))
      return BenchHistory(Map.empty, Map.empty, Nil, Nil)
    val lines = java.nio.file.Files.readAllLines(p)
    val perQuery = scala.collection.mutable.Map.empty[String, List[Double]]
    val sf1PerQuery = scala.collection.mutable.Map.empty[String, List[Double]]
    val calibs = List.newBuilder[Double]
    val calibIos = List.newBuilder[Double]
    val calibMts = List.newBuilder[Double]
    val dispersions = List.newBuilder[Double]
    val calibShuffles = List.newBuilder[Double]
    lines.forEach { line =>
      QueriesRe.findFirstMatchIn(line).foreach { qm =>
        EntryRe.findAllMatchIn(qm.group(1)).foreach { e =>
          val v = try e.group(2).toDouble catch { case _: NumberFormatException => -1.0 }
          if (v >= 0) perQuery.updateWith(e.group(1))(o => Some(v :: o.getOrElse(Nil)))
        }
      }
      Sf1EntryRe.findAllMatchIn(line).foreach { e =>
        val v = try e.group(3).toDouble catch { case _: NumberFormatException => -1.0 }
        if (v >= 0) sf1PerQuery.updateWith(e.group(1))(o => Some(v :: o.getOrElse(Nil)))
      }
      CalibRe.findFirstMatchIn(line).foreach(m => calibs += m.group(1).toDouble)
      CalibIoRe.findFirstMatchIn(line).foreach(m => calibIos += m.group(1).toDouble)
      CalibMtRe.findFirstMatchIn(line).foreach(m => calibMts += m.group(1).toDouble)
      DispersionRe.findFirstMatchIn(line).foreach(m => dispersions += m.group(1).toDouble)
      CalibShuffleRe.findFirstMatchIn(line).foreach(m => calibShuffles += m.group(1).toDouble)
    }
    BenchHistory(perQuery.view.mapValues(_.toSeq).toMap,
      sf1PerQuery.view.mapValues(_.toSeq).toMap, calibs.result(), calibIos.result(),
      calibMts.result(), dispersions.result(), calibShuffles.result())
  }
}
