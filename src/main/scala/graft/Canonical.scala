package graft

import org.apache.spark.sql.{DataFrame, Row}

/** Canonical result-set hash — the compare-side instrumentation the
  * round-14 verdict demanded: after graft.Verify writes a query's
  * parquet, it re-reads those exact bytes and records
  * sha256(canonical form) beside the run stamp, and tools/check.py
  * recomputes the SAME canonical form from the SAME bytes through a
  * COMPLETELY DIFFERENT reader stack (DuckDB + Python). If a checker
  * ever fails a row whose two canonical hashes agree with each other
  * and with the oracle's, the defect is proven to live in that
  * checker's compare layer, bytes-on-disk — diagnosable instead of
  * adjudicable (the three-round `pipeline_length_buckets` ambiguity).
  *
  * The canonical form (mirrored exactly in tools/check.py):
  *   - columns sorted by name (ASCII); header = names joined US (0x1f)
  *   - each cell rendered engine-neutrally:
  *     null->"null"; boolean->"true"/"false"; integers->decimal
  *     digits; doubles/floats (floats widened exactly)->"nan" or
  *     "d"+16-hex IEEE-754 bits; strings->"s<codepoints>:<text>";
  *     decimals->"m"+normalized plain string; timestamps->"t"+epoch
  *     micros (floor); dates->"D"+ISO yyyy-MM-dd; binary->"b"+hex;
  *     arrays "[a,b]"; structs "{a,b}" in schema field order
  *   - rows = cells in sorted-column order joined US (0x1f), row list
  *     sorted by UTF-8 byte order, joined RS (0x1e) after the header
  *   - sha256 over the UTF-8 bytes of the whole string
  *
  * IEEE bit-pattern rendering (not decimal formatting) is the point:
  * Java's Double.toString and Python's repr disagree on some values,
  * but two readers of the same parquet see the same 64 bits. */
object Canonical {

  def renderCell(v: Any): String = v match {
    case null => "null"
    case s: String => s"s${s.codePointCount(0, s.length)}:$s"
    case b: java.lang.Boolean => if (b) "true" else "false"
    case f: java.lang.Float => renderDouble(f.doubleValue())
    case d: java.lang.Double => renderDouble(d.doubleValue())
    case b: java.lang.Byte => b.toString
    case s: java.lang.Short => s.toString
    case i: java.lang.Integer => i.toString
    case l: java.lang.Long => l.toString
    case bd: java.math.BigDecimal => "m" + plainDecimal(bd)
    case bd: scala.math.BigDecimal => "m" + plainDecimal(bd.underlying)
    case t: java.sql.Timestamp =>
      "t" + (Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case t: java.time.Instant =>
      "t" + (t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case t: java.time.LocalDateTime =>
      val e = t.toEpochSecond(java.time.ZoneOffset.UTC)
      "t" + (e * 1000000L + t.getNano / 1000L)
    case d: java.sql.Date => "D" + d.toString
    case d: java.time.LocalDate => "D" + d.toString
    case b: Array[Byte] => "b" + b.map("%02x".format(_)).mkString
    case a: scala.collection.Seq[_] =>
      a.map(renderCell).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, mv) => renderCell(k) + "=" + renderCell(mv) }
        .sorted.mkString("<", ",", ">")
    case r: Row => r.toSeq.map(renderCell).mkString("{", ",", "}")
    case other => "u" + other.toString
  }

  private def renderDouble(d: Double): String =
    if (d.isNaN) "nan"
    else "d%016x".format(java.lang.Double.doubleToLongBits(d))

  private def plainDecimal(bd: java.math.BigDecimal): String =
    bd.stripTrailingZeros.toPlainString

  /** Unsigned-UTF-8-byte ordering — matches Python's
    * `sorted(key=lambda s: s.encode("utf-8"))`, which Java's UTF-16
    * String ordering does NOT for supplementary characters. */
  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    var r = 0
    while (r == 0 && i < x.length && i < y.length) {
      r = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      i += 1
    }
    if (r != 0) r else java.lang.Integer.compare(x.length, y.length)
  }

  /** sha256 hex of [[df]]'s canonical form. Collects — verify outputs
    * are bounded report frames by design (§4), never corpus-sized. */
  def hashOf(df: DataFrame): String = {
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => (0 until r.length).map(i => renderCell(r.get(i))).mkString("\u001f"))
      .sorted(utf8Order)
    val body = cols.mkString("\u001f") + "\u001e" + rows.mkString("\u001e")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }
}
