package graft.ops

import graft.SparkSpec

/** Bradley–Terry: planted dominance must order the latent strengths. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("BT strengths recover a planted A > B > C dominance order") {
    // Interleave sources so every (doc_id, doc_id+1) pair crosses
    // sources; ttr is highest for A docs, middling for B, lowest for C
    // (distinct tokens vs repeated ones).
    val texts = Map(
      "A" -> "alpha beta gamma delta epsilon zeta",     // ttr 1.0
      "B" -> "red blue green red blue red",             // ttr 0.5
      "C" -> "spam spam spam spam spam ham")            // ttr 1/3
    val rows = (0 until 30).map { i =>
      val src = Seq("A", "B", "C")(i % 3)
      (i.toLong, texts(src), "en", src, 1L)
    }
    val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Preference.bradleyTerry(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (sa, wa, na) = got("A"); val (sb, wb, nb) = got("B"); val (sc, wc, nc) = got("C")
    assert(sa > sb && sb > sc, s"A=$sa B=$sb C=$sc")
    assert(wa > wb && wb > wc, s"wins A=$wa B=$wb C=$wc")
    assert(na > 0 && nb > 0 && nc > 0)
    // mean-1 rescaling each round
    assert(math.abs((sa + sb + sc) / 3.0 - 1.0) < 1e-12)
  }
}
