package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Audio

/** Round-12 family: the AUDIO face of the multimodal pipeline — a REAL
  * PCM16-WAV codec ([[graft.multimodal.AudioCodec]]: RIFF chunk walk, fmt
  * validation, little-endian sample parse) behind the same batched
  * `mapPartitions` stages as the image family. Payloads are synthesized
  * deterministically from the text bytes ([[Audio.syntheticWav]]) so every
  * decoded field is DuckDB-derivable: the oracles replay sample synthesis,
  * framing, zero-crossing, and the truncating-integer linear resample
  * SAMPLE-BY-SAMPLE from the generator formulas, while the Spark side gets
  * them only by parsing the bytes it encoded — a mis-encode, mis-parse, or
  * wrong DSP breaks the hash.
  *
  * Scale: all three stages are map-side decode (CPU linear in corpus bytes)
  * with one presentation sort at the top — the same 100 TB cost model as the
  * image stages ([[Extensions.multimodalFrames]]); nothing shuffles payload
  * bytes.
  */
object Media {

  /** Shared oracle prelude: per-document hex payload + the synthetic-clip
    * sample grid. sv = sample value at index k, replaying
    * [[Audio.syntheticWav]]: s(k) = ((b(k mod len) + 37k) mod 256 − 128)·256
    * + b(k mod len), n = len mod 240 + 16.
    */
  private def sampleCte: String =
    """WITH t AS (SELECT doc_id, COALESCE(NULLIF(hex(encode(text)), ''), '00') AS hx,
                  GREATEST(octet_length(encode(text)), 1) AS len FROM documents),
            d0 AS (SELECT doc_id, hx, len, len % 240 + 16 AS n FROM t),
            gk AS (SELECT doc_id, hx, len, n, unnest(range(0, n)) AS k FROM d0),
            sv AS (SELECT doc_id, n, k,
                     ((16*(strpos('0123456789ABCDEF', hx[2*(k%len)+1])-1)
                         + (strpos('0123456789ABCDEF', hx[2*(k%len)+2])-1)
                       + 37*k) % 256 - 128) * 256
                     + 16*(strpos('0123456789ABCDEF', hx[2*(k%len)+1])-1)
                     + (strpos('0123456789ABCDEF', hx[2*(k%len)+2])-1) AS s
                   FROM gk)"""

  /** Audio metadata decode: container size and the PARSED sample rate /
    * sample count / truncating duration. The oracle predicts the canonical
    * 44-byte-header container size (44 + 2n) and the generator's sample
    * count; `sample_rate` must survive the fmt-chunk round trip.
    */
  val audioMeta = Q(
    "x_audio_meta",
    (s, d) =>
      Audio.decodeMeta(s, Audio.withAudioPayload(s, Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_bytes"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_samples").cast("long").as("n_samples"),
          col("duration_ms"))
        .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, GREATEST(octet_length(encode(text)), 1) % 240 + 16 AS n
                       FROM documents)
            SELECT doc_id, CAST(44 + 2 * n AS BIGINT) AS n_bytes,
              CAST(8000 AS BIGINT) AS sample_rate,
              CAST(n AS BIGINT) AS n_samples,
              CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms
            FROM t ORDER BY doc_id""")
  )

  /** Audio feature extraction — the screening pass of a speech-curation
    * pipeline (silence / clipping / activity gates): 64-sample frame count,
    * total absolute amplitude, zero crossings, peak. The oracle recomputes
    * EVERY sample from the synthesis formula and folds the same integer
    * aggregates (zero crossing = sign flip under `x < 0`, lag over the
    * sample grid), so the decoded waveform — not just its shape — is
    * verified row-level.
    */
  val audioFeatures = Q(
    "x_audio_features",
    (s, d) =>
      Audio.extractFeatures(s, Audio.withAudioPayload(s, Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
          col("energy_sum"), col("zero_cross").cast("long").as("zero_cross"),
          col("peak_abs").cast("long").as("peak_abs"))
        .orderBy("doc_id"),
    Some(sampleCte + """,
            f AS (SELECT doc_id, n, k, s,
                    lag(s) OVER (PARTITION BY doc_id ORDER BY k) AS sp
                  FROM sv)
            SELECT doc_id, CAST(max(n) // 64 AS BIGINT) AS n_frames,
              CAST(sum(abs(s)) AS BIGINT) AS energy_sum,
              CAST(sum(CASE WHEN sp IS NOT NULL AND ((sp < 0) <> (s < 0))
                            THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
              CAST(max(abs(s)) AS BIGINT) AS peak_abs
            FROM f GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Audio linear resample to a fixed 40-sample clip digest
    * ([[graft.multimodal.AudioCodec.resampleLinear]] — truncating integer
    * interpolation, decimation or upsampling depending on the clip). The
    * oracle replays every output position's source indices lo/hi, fraction,
    * and truncated interpolation in SQL, then folds the sum and a
    * position-weighted checksum — a wrong index map, wrong rounding, or
    * permuted output all break the hash.
    */
  val audioResample = Q(
    "x_audio_resample",
    (s, d) =>
      Audio.resampleClips(s, Audio.withAudioPayload(s, Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_out").cast("long").as("n_out"),
          col("out_sum"), col("out_checksum"))
        .orderBy("doc_id"),
    Some(sampleCte + """,
            gj AS (SELECT DISTINCT doc_id, n, unnest(range(0, 40)) AS j FROM sv),
            pos AS (SELECT doc_id, n, j, j*(n-1) // 39 AS lo, j*(n-1) % 39 AS frac
                    FROM gj),
            iv AS (SELECT p.doc_id, p.j,
                     a.s + CASE WHEN p.frac > 0
                                THEN ((b.s - a.s) * p.frac) // 39 ELSE 0 END AS v
                   FROM pos p
                   JOIN sv a ON a.doc_id = p.doc_id AND a.k = p.lo
                   LEFT JOIN sv b ON b.doc_id = p.doc_id AND b.k = p.lo + 1)
            SELECT doc_id, CAST(40 AS BIGINT) AS n_out,
              CAST(sum(v) AS BIGINT) AS out_sum,
              CAST(sum(v * (j + 1)) AS BIGINT) AS out_checksum
            FROM iv GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Audio near-dup fingerprinting ([[Audio.fingerprint]]) — the dedup face
    * of the audio modality (the aHash pattern on waveforms): decode →
    * 40-sample linear resample → sign bit per sample packed into one long,
    * then the hash-equality group size per document. The oracle replays
    * resample AND bit packing sample-by-sample, then the same group count —
    * decode, DSP, and thresholding all row-level verified.
    *
    * Scale: map-side decode+fingerprint, ONE hash-value exchange for the
    * group counts (partitioned by the 40-bit fingerprint — no skew beyond
    * true duplicate mass); Hamming banding on the fingerprint drops in for
    * near-miss pairs exactly as in SimHash.
    */
  val audioFingerprint = Q(
    "x_audio_fingerprint",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      Audio.fingerprint(s, Audio.withAudioPayload(s, Tables.documents(s, d)))
        .toDF()
        .withColumn("n_dups", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .select(col("doc_id"), col("fp"), col("n_dups"))
        .orderBy("doc_id")
    },
    Some(sampleCte + """,
            gj AS (SELECT DISTINCT doc_id, n, unnest(range(0, 40)) AS j FROM sv),
            pos AS (SELECT doc_id, n, j, j*(n-1) // 39 AS lo, j*(n-1) % 39 AS frac
                    FROM gj),
            iv AS (SELECT p.doc_id, p.j,
                     a.s + CASE WHEN p.frac > 0
                                THEN ((b.s - a.s) * p.frac) // 39 ELSE 0 END AS v
                   FROM pos p
                   JOIN sv a ON a.doc_id = p.doc_id AND a.k = p.lo
                   LEFT JOIN sv b ON b.doc_id = p.doc_id AND b.k = p.lo + 1),
            fps AS (
              SELECT doc_id,
                CAST(sum(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS fp
              FROM iv GROUP BY doc_id)
            SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_dups
            FROM fps ORDER BY doc_id""")
  )

  /** MULTIMODAL curation pipeline — the three modalities' gates chained in
    * ONE oracled plan (the x_curation_pipeline discipline extended across
    * media): text gate (language + length) → audio ACTIVITY gate (decode the
    * WAV payload, keep clips with ≥8 zero crossings and ≥8000 peak — the
    * silence/dead-air screen of a speech pipeline) → image NEAR-DUP removal
    * (aHash equality groups keep their lowest doc_id). The oracle replays
    * every stage — audio sample synthesis + features, raster decode + 8×8
    * aHash bits, and the group-min survivor rule — end to end in SQL.
    *
    * Scale: both decode gates are map-side (payload bytes never shuffle);
    * the only exchanges are the aHash-equality group and the final joins on
    * doc_id over the shrinking survivor set — filter early, dedup late, the
    * curation cost model.
    */
  val curationMultimodal = Q(
    "x_curation_multimodal",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs  = Tables.documents(s, d)
      val gated = docs.filter(col("lang").isin("en", "de") && col("n_chars").between(40, 800))
      val feats = Audio.extractFeatures(s, Audio.withAudioPayload(s, gated)).toDF()
        .filter(col("zero_cross") >= 8 && col("peak_abs") >= 8000)
        .select(col("doc_id"), col("zero_cross").cast("long").as("zero_cross"))
      val active = gated.join(feats, "doc_id")
      val keep = graft.multimodal.Multimodal
        .averageHash(s, graft.multimodal.Multimodal.withImagePayload(s, active)).toDF()
        .withColumn("__rk", row_number().over(
          Window.partitionBy(col("ahash_hi"), col("ahash_lo")).orderBy(col("doc_id"))))
        .filter(col("__rk") === 1)
        .select("doc_id")
      active.join(keep, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("zero_cross"))
        .orderBy("doc_id")
    },
    Some("""WITH g AS (
              SELECT doc_id, lang, n_chars, text FROM documents
              WHERE lang IN ('en', 'de') AND n_chars BETWEEN 40 AND 800),
            t AS (SELECT doc_id, COALESCE(NULLIF(hex(encode(text)), ''), '00') AS hx,
                         GREATEST(octet_length(encode(text)), 1) AS len FROM g),
            a0 AS (SELECT doc_id, hx, len, len % 240 + 16 AS n FROM t),
            agk AS (SELECT doc_id, hx, len, n, unnest(range(0, n)) AS k FROM a0),
            asv AS (SELECT doc_id, k,
                     ((16*(strpos('0123456789ABCDEF', hx[2*(k%len)+1])-1)
                         + (strpos('0123456789ABCDEF', hx[2*(k%len)+2])-1)
                       + 37*k) % 256 - 128) * 256
                     + 16*(strpos('0123456789ABCDEF', hx[2*(k%len)+1])-1)
                     + (strpos('0123456789ABCDEF', hx[2*(k%len)+2])-1) AS s
                    FROM agk),
            af AS (SELECT doc_id, k, s,
                     lag(s) OVER (PARTITION BY doc_id ORDER BY k) AS sp
                   FROM asv),
            feat AS (
              SELECT doc_id,
                sum(CASE WHEN sp IS NOT NULL AND ((sp < 0) <> (s < 0))
                         THEN 1 ELSE 0 END) AS zc,
                max(abs(s)) AS peak
              FROM af GROUP BY doc_id),
            act AS (
              SELECT g.doc_id, g.lang, g.n_chars, CAST(feat.zc AS BIGINT) AS zero_cross
              FROM g JOIN feat USING (doc_id)
              WHERE feat.zc >= 8 AND feat.peak >= 8000),
            i0 AS (SELECT t.doc_id, t.hx, t.len, t.len % 64 + 1 AS w, t.len % 48 + 1 AS h
                   FROM t JOIN act USING (doc_id)),
            i1 AS (SELECT *, LEAST(w, 8) AS ow, LEAST(h, 8) AS oh FROM i0),
            gy AS (SELECT doc_id, hx, len, w, h, ow, oh, unnest(range(0, oh)) AS y FROM i1),
            gx AS (SELECT doc_id, hx, len, w, h, ow, oh, y, unnest(range(0, ow)) AS x FROM gy),
            lum AS (
              SELECT doc_id, ow, oh, y * ow + x AS i,
                (SELECT sum(16 * (strpos('0123456789ABCDEF', hx[2*bi+1]) - 1)
                          + (strpos('0123456789ABCDEF', hx[2*bi+2]) - 1))
                 FROM (SELECT (3 * ((y * h // oh) * w + (x * w // ow)) + c.c) % len AS bi
                       FROM range(0, 3) c(c)) z) AS lv
              FROM gx),
            tot AS (
              SELECT doc_id, ow * oh AS n, sum(lv) AS tv FROM lum
              GROUP BY doc_id, ow, oh),
            bits AS (
              SELECT l.doc_id,
                CAST(COALESCE(sum(CASE WHEN l.i >= 32 AND t.n * l.lv > t.tv
                       THEN 1::BIGINT << (l.i - 32) ELSE 0 END), 0) AS BIGINT) AS ahash_hi,
                CAST(COALESCE(sum(CASE WHEN l.i < 32 AND t.n * l.lv > t.tv
                       THEN 1::BIGINT << l.i ELSE 0 END), 0) AS BIGINT) AS ahash_lo
              FROM lum l JOIN tot t ON l.doc_id = t.doc_id
              GROUP BY l.doc_id),
            keep AS (SELECT min(doc_id) AS doc_id FROM bits GROUP BY ahash_hi, ahash_lo)
            SELECT a.doc_id, a.lang, a.n_chars, a.zero_cross
            FROM act a JOIN keep USING (doc_id) ORDER BY a.doc_id""")
  )

  val qs: Seq[Q] = Seq(audioMeta, audioFeatures, audioResample, audioFingerprint, curationMultimodal)
}
