package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PNG scatter-plot sink (reference S7: `/root/reference/src/main.py:371–376`
  * writes a t-SNE cluster scatter as a PNG artifact). A real image
  * sink: renders (x, y) points colored by label into a PNG via the
  * JDK's ImageIO codec — no plotting library.
  *
  * Scale posture: an image is a DRIVER artifact by definition; the
  * input is expected to be a bounded viz sample (the same contract as
  * [[graft.operators.Tsne]], enforced with a row cap), and whatever
  * sampling bounds it runs distributed upstream.
  */
object PlotSink {

  /** Distinct, stable color per label: golden-angle hue walk. */
  private def colorOf(label: Long): Int = {
    val hue = ((label * 0.61803398875) % 1.0).toFloat
    java.awt.Color.HSBtoRGB(hue, 0.75f, 0.85f) & 0xffffff
  }

  /** Render `df`'s (xCol, yCol) points, colored by `labelCol`, into a
    * `width`×`height` PNG at `path`. Returns the path. Throws when the
    * input exceeds `maxRows` (plot a sample, not a corpus). */
  def scatterPng(df: DataFrame, xCol: String, yCol: String,
                 labelCol: String, path: String,
                 width: Int = 640, height: Int = 480,
                 maxRows: Int = 100000): String = {
    // a viz sink degrades rather than crashes: drop rows with null or
    // non-finite coordinates / null labels instead of NPE-ing mid-render
    // or letting one NaN poison the min/max scaling for every point
    val rows = df.select(col(xCol).cast("double"), col(yCol).cast("double"),
        col(labelCol).cast("long"))
      .where(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(labelCol).isNotNull &&
        !isnan(col(xCol).cast("double")) && !isnan(col(yCol).cast("double")) &&
        abs(col(xCol).cast("double")) < Double.MaxValue &&
        abs(col(yCol).cast("double")) < Double.MaxValue)
      .limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"scatterPng renders a bounded sample: got > $maxRows rows")
    require(rows.nonEmpty,
      "scatterPng needs a non-empty input (after dropping null/non-finite rows)")

    val xs = rows.map(_.getDouble(0)); val ys = rows.map(_.getDouble(1))
    val (x0, x1) = (xs.min, xs.max); val (y0, y1) = (ys.min, ys.max)
    val margin = 20
    def toPx(v: Double, lo: Double, hi: Double, span: Int): Int =
      if (hi > lo) margin + ((v - lo) / (hi - lo) * (span - 2 * margin)).toInt
      else span / 2

    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var py = 0
    while (py < height) { // white background
      var px = 0
      while (px < width) { img.setRGB(px, py, 0xffffff); px += 1 }
      py += 1
    }
    rows.foreach { r =>
      val cx = toPx(r.getDouble(0), x0, x1, width)
      // image y grows downward; data y grows upward
      val cy = height - 1 - toPx(r.getDouble(1), y0, y1, height)
      val rgb = colorOf(r.getLong(2))
      var dy = -1
      while (dy <= 1) { // 3×3 point marker
        var dx = -1
        while (dx <= 1) {
          val qx = cx + dx; val qy = cy + dy
          if (qx >= 0 && qx < width && qy >= 0 && qy < height)
            img.setRGB(qx, qy, rgb)
          dx += 1
        }
        dy += 1
      }
    }
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    javax.imageio.ImageIO.write(img, "png", f)
    path
  }
}
