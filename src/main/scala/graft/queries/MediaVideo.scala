package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Video

/** Round-14 family: the VIDEO face of the multimodal pipeline — a REAL
  * ISO-BMFF (MP4) container codec ([[graft.multimodal.VideoCodec]]: box
  * walk, 16.16 tkhd dimensions, stts/stss/stsz/stsc/stco sample tables,
  * chunk-map frame slicing) behind the same batched `mapPartitions` stages
  * as the image and audio families. Payloads are synthesized
  * deterministically from the text bytes ([[Video.syntheticMp4]]) so every
  * decoded field is DuckDB-derivable: the oracles replay frame-grid
  * synthesis, per-pixel luma, frame differencing, and the GOP/keyframe
  * structure in SQL, while the Spark side gets them only by parsing the
  * container it encoded — a mis-encode, mis-parse, or wrong chunk map
  * breaks the hash.
  *
  * Scale: all four stages are map-side decode (CPU linear in corpus bytes)
  * with one presentation sort at the top — the 100 TB cost model of every
  * multimodal stage; payload bytes never shuffle. The keyframe stage reads
  * ONLY sync samples via stss (a seek pattern, not decode-all), exactly how
  * a thumbnail/sampling pass survives petabyte video corpora.
  */
object MediaVideo {

  /** Shared oracle prelude: per-document hex payload + the synthetic clip
    * geometry (w = len%16+4, h = len%12+4, n = len%10+4, GOP 4), replaying
    * [[Video.syntheticMp4]].
    */
  private def geomCte: String =
    """WITH t AS (SELECT doc_id, COALESCE(NULLIF(hex(encode(text)), ''), '00') AS hx,
                  GREATEST(octet_length(encode(text)), 1) AS len FROM documents),
            g AS (SELECT doc_id, hx, len, len % 16 + 4 AS w, len % 12 + 4 AS h,
                         len % 10 + 4 AS n FROM t)"""

  /** GEN-FACE prelude (Q.genOracle): the pixel grid reduced to a per-doc
    * BYTE HISTOGRAM. Writing p(f,i) = (q(i) + c(f)) mod 256 with
    * q(i) = (b(i mod len) + 3i) mod 256 and c(f) = 40·(f div 4) + f mod 4
    * (≤ 123 for n ≤ 13), every per-frame quantity is arithmetic over the
    * histogram of q:
    *   W(f)  = #{i : q(i) ≥ 256 − c(f)}                 (pixels that wrap)
    *   S(f)  = Σ_i p(f,i) = Σq + px·c(f) − 256·W(f)
    *   sad(f) = Σ_i |p(f,i) − p(f−1,i)| = δ·px + (256 − 2δ)·(W(f) − W(f−1))
    *     where δ = c(f) − c(f−1) ∈ {1, 37}: the pixel difference is δ
    *     except on the W(f) − W(f−1) pixels whose add newly wraps (δ − 256
    *     there, |·| = 256 − δ; q + c(f−1) can never wrap without q + c(f)
    *     wrapping since δ > 0, and 512 − c(f) > 256 rules out double wrap).
    * One LINEAR pixel pass builds the ≤256-bin histogram; everything after
    * is ≤ 256·n rows per doc — no (doc, pixel) lag window, no n·px
    * enumeration. This face is pure algebra over the same synthesis formula
    * the per-pixel referee replays; the sweep cross-checks the two faces on
    * a dir where both run before trusting this one at 100×.
    */
  private def pqCte: String =
    geomCte + """,
            gi AS (SELECT doc_id, hx, len, w, h, n, unnest(range(0, w * h)) AS i FROM g),
            pq AS (SELECT doc_id, w, h, n,
                     (16*(strpos('0123456789ABCDEF', hx[2*(i%len)+1])-1)
                        + (strpos('0123456789ABCDEF', hx[2*(i%len)+2])-1)
                      + 3*i) % 256 AS q
                   FROM gi)"""

  private def histCte: String =
    pqCte + """,
            hist AS (SELECT doc_id, w, h, n, q, count(*) AS c
                     FROM pq GROUP BY doc_id, w, h, n, q)"""

  /** Per-(doc, frame, pixel) luma grid: p(f, i) =
    * (b(i mod len) + 40·(f div 4) + (f mod 4) + 3·i) mod 256.
    */
  private def pixCte: String =
    geomCte + """,
            gf AS (SELECT doc_id, hx, len, w, h, n, unnest(range(0, n)) AS f FROM g),
            gi AS (SELECT doc_id, hx, len, w, h, n, f,
                          unnest(range(0, w * h)) AS i FROM gf),
            pix AS (SELECT doc_id, w, h, n, f, i,
                      (16*(strpos('0123456789ABCDEF', hx[2*(i%len)+1])-1)
                         + (strpos('0123456789ABCDEF', hx[2*(i%len)+2])-1)
                       + 40*(f//4) + (f%4) + 3*i) % 256 AS p
                    FROM gi)"""

  /** Container-metadata decode: total size, sample-entry codec 4cc, 16.16
    * dimensions, frame count, duration, keyframe count. The oracle predicts
    * the canonical box layout closed-form (ftyp 16 + mdat 8+n·w·h + moov
    * 445+4n+4·ceil(n/4)); every parsed field must survive the box-tree
    * round trip.
    */
  val videoMeta = Q(
    "x_video_meta",
    (s, d) =>
      Video.decodeMeta(s, Video.withVideoPayload(s, Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("codec"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          col("duration_ms"),
          col("n_keyframes").cast("long").as("n_keyframes"))
        .orderBy("doc_id"),
    Some(geomCte + """
            SELECT doc_id,
              CAST(469 + n*w*h + 4*n + 4*((n+3)//4) AS BIGINT) AS n_bytes,
              'gry8' AS codec,
              CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
              CAST(n AS BIGINT) AS n_frames,
              CAST(n * 40 AS BIGINT) AS duration_ms,
              CAST((n+3)//4 AS BIGINT) AS n_keyframes
            FROM g ORDER BY doc_id""")
  )

  /** Keyframe thumbnail digest — sample ONLY the stss sync frames (f ≡ 0 mod
    * 4) and fold keyframe luma totals plus a frame-index-weighted checksum.
    * The oracle recomputes EVERY keyframe pixel from the synthesis formula;
    * a wrong stss parse, wrong frame slice, or permuted sample order breaks
    * the hash.
    */
  val videoFrameSample = Q(
    "x_video_frame_sample",
    (s, d) =>
      Video.sampleKeyframes(s, Video.withVideoPayload(s, Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_sampled").cast("long").as("n_sampled"),
          col("luma_total"), col("luma_checksum"))
        .orderBy("doc_id"),
    Some(pixCte + """,
            ks AS (SELECT doc_id, f, sum(p) AS fs FROM pix
                   WHERE f % 4 = 0 GROUP BY doc_id, f)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
              CAST(sum(fs) AS BIGINT) AS luma_total,
              CAST(sum(fs * (f + 1)) AS BIGINT) AS luma_checksum
            FROM ks GROUP BY doc_id ORDER BY doc_id"""),
    genOracle = Some(histCte + """,
            fr AS (SELECT doc_id, w, h, n, unnest(range(0, n)) AS f FROM g),
            ks AS (SELECT fr.doc_id, fr.f,
                     sum(h2.c * h2.q) + fr.w*fr.h*(40*(fr.f//4) + (fr.f%4))
                     - 256*sum(CASE WHEN h2.q >= 256 - (40*(fr.f//4) + (fr.f%4))
                               THEN h2.c ELSE 0 END) AS fs
                   FROM fr JOIN hist h2 USING (doc_id)
                   WHERE fr.f % 4 = 0
                   GROUP BY fr.doc_id, fr.f, fr.w, fr.h)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
              CAST(sum(fs) AS BIGINT) AS luma_total,
              CAST(sum(fs * (f + 1)) AS BIGINT) AS luma_checksum
            FROM ks GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Scene-cut detection by frame differencing (the shot-boundary baseline):
    * sad(f) = Σ_i |p(f,i) − p(f−1,i)|, cut when sad > 16·px. The synthetic
    * GOP structure puts a +40 luma jump at every scene boundary and +1
    * "motion" inside scenes, so the threshold discriminates by an order of
    * magnitude — and the oracle replays every pixel pair via a lag over the
    * (doc, pixel) grid.
    */
  val videoSceneCuts = Q(
    "x_video_scene_cuts",
    (s, d) =>
      Video.detectSceneCuts(s, Video.withVideoPayload(s, Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_cuts").cast("long").as("n_cuts"),
          col("first_cut").cast("long").as("first_cut"),
          col("total_motion"), col("max_sad"))
        .orderBy("doc_id"),
    Some(pixCte + """,
            d2 AS (SELECT doc_id, w, h, f, i, p,
                     lag(p) OVER (PARTITION BY doc_id, i ORDER BY f) AS pp
                   FROM pix),
            sad AS (SELECT doc_id, w, h, f, sum(abs(p - pp)) AS sad
                    FROM d2 WHERE pp IS NOT NULL GROUP BY doc_id, w, h, f)
            SELECT doc_id,
              CAST(sum(CASE WHEN sad > 16*w*h THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
              CAST(COALESCE(min(CASE WHEN sad > 16*w*h THEN f END), -1) AS BIGINT) AS first_cut,
              CAST(sum(sad) AS BIGINT) AS total_motion,
              CAST(max(sad) AS BIGINT) AS max_sad
            FROM sad GROUP BY doc_id ORDER BY doc_id"""),
    genOracle = Some(histCte + """,
            fr AS (SELECT doc_id, w, h, n, unnest(range(1, n)) AS f FROM g),
            wv AS (SELECT fr.doc_id, fr.w, fr.h, fr.f,
                     sum(CASE WHEN h2.q >= 256 - (40*(fr.f//4) + (fr.f%4))
                         THEN h2.c ELSE 0 END) AS wf,
                     sum(CASE WHEN h2.q >= 256 - (40*((fr.f-1)//4) + ((fr.f-1)%4))
                         THEN h2.c ELSE 0 END) AS wp
                   FROM fr JOIN hist h2 USING (doc_id)
                   GROUP BY fr.doc_id, fr.w, fr.h, fr.f),
            sad AS (SELECT doc_id, w, h, f,
                      (CASE WHEN f % 4 = 0 THEN 37 ELSE 1 END) * w * h
                      + (256 - 2*(CASE WHEN f % 4 = 0 THEN 37 ELSE 1 END)) * (wf - wp) AS sad
                    FROM wv)
            SELECT doc_id,
              CAST(sum(CASE WHEN sad > 16*w*h THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
              CAST(COALESCE(min(CASE WHEN sad > 16*w*h THEN f END), -1) AS BIGINT) AS first_cut,
              CAST(sum(sad) AS BIGINT) AS total_motion,
              CAST(max(sad) AS BIGINT) AS max_sad
            FROM sad GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Temporal-activity fingerprint — the dedup face of the video modality
    * (the audio sign-signature pattern on the luma timeline): bit (f−1) set
    * iff frame f's luma sum ≥ frame f−1's, plus the fingerprint-equality
    * group size. The oracle replays per-frame sums, the lag comparison, and
    * the bit packing — decode, frame slicing, and the trajectory signature
    * all row-level verified.
    */
  val videoFingerprint = Q(
    "x_video_fingerprint",
    (s, d) => {
      // n_dups via groupBy + broadcast join, NOT a window over fp: the
      // fingerprint has ≤2^12 distinct values (n ≤ 13 frames → 12 bits), so
      // at corpus scale a partitionBy(fp) window funnels millions of rows
      // per fp through one task, while the count frame is bounded by
      // CONSTRUCTION at 4 097 rows — always broadcastable. (r14 ADVICE)
      val fps = Video.fingerprint(s, Video.withVideoPayload(s, Tables.documents(s, d))).toDF()
      val counts = fps.groupBy(col("fp")).agg(count(lit(1)).as("n_dups"))
      fps.join(broadcast(counts), "fp")
        .select(col("doc_id"), col("fp"), col("n_dups"))
        .orderBy("doc_id")
    },
    Some(pixCte + """,
            fs AS (SELECT doc_id, f, sum(p) AS s FROM pix GROUP BY doc_id, f),
            fd AS (SELECT doc_id, f, s,
                     lag(s) OVER (PARTITION BY doc_id ORDER BY f) AS sp
                   FROM fs),
            fps AS (SELECT doc_id,
                      CAST(COALESCE(sum(CASE WHEN sp IS NOT NULL AND s >= sp
                        THEN CAST(1 AS BIGINT) << (f - 1) ELSE 0 END), 0) AS BIGINT) AS fp
                    FROM fd GROUP BY doc_id)
            SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_dups
            FROM fps ORDER BY doc_id"""),
    // GEN FACE: S(f) and S(f−1) both from the histogram in ONE grouped
    // join (f ranges over 1..n−1; bit f−1 compares them) — no lag window
    // and no per-(frame, pixel) enumeration.
    genOracle = Some(histCte + """,
            fr AS (SELECT doc_id, w, h, n, unnest(range(1, n)) AS f FROM g),
            fd AS (SELECT fr.doc_id, fr.f,
                     sum(h2.c * h2.q) + fr.w*fr.h*(40*(fr.f//4) + (fr.f%4))
                     - 256*sum(CASE WHEN h2.q >= 256 - (40*(fr.f//4) + (fr.f%4))
                               THEN h2.c ELSE 0 END) AS s,
                     sum(h2.c * h2.q) + fr.w*fr.h*(40*((fr.f-1)//4) + ((fr.f-1)%4))
                     - 256*sum(CASE WHEN h2.q >= 256 - (40*((fr.f-1)//4) + ((fr.f-1)%4))
                               THEN h2.c ELSE 0 END) AS sp
                   FROM fr JOIN hist h2 USING (doc_id)
                   GROUP BY fr.doc_id, fr.w, fr.h, fr.f),
            fps AS (SELECT g.doc_id,
                      CAST(COALESCE(sum(CASE WHEN fd.s >= fd.sp
                        THEN CAST(1 AS BIGINT) << (fd.f - 1) ELSE 0 END), 0) AS BIGINT) AS fp
                    FROM g LEFT JOIN fd USING (doc_id) GROUP BY g.doc_id)
            SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_dups
            FROM fps ORDER BY doc_id""")
  )

  /** VIDEO curation pipeline — the video face of the multimodal curation
    * family (`x_curation_multimodal` chains text→audio→image; this chains
    * text→video): text gate (language + length) → video MOTION gate (decode
    * the MP4 payload, keep clips with at least one scene cut and total
    * motion ≥ 6·px·(n−1), i.e. an average of 6 grey levels per pixel per
    * frame step — the static-slate/dead-footage screen of a video
    * pipeline) → temporal-fingerprint near-dup removal (fp-equality groups
    * keep their lowest doc_id). The oracle replays every stage — gates,
    * per-pixel frame differencing, per-frame luma sums, bit packing, and
    * the group-min survivor rule — end to end in SQL.
    *
    * Scale: both video stages are map-side batched decode (payload bytes
    * never shuffle); the only exchanges are the fp-equality group and the
    * survivor joins on doc_id over the shrinking set — filter early, dedup
    * late, the curation cost model.
    */
  val curationVideo = Q(
    "x_curation_video",
    (s, d) => {
      val docs  = Tables.documents(s, d)
      val gated = docs.filter(col("lang").isin("en", "de", "fr") && col("n_chars").between(30, 700))
      val pay   = Video.withVideoPayload(s, gated)
      val meta  = Video.decodeMeta(s, pay).toDF()
        .select(col("doc_id"), (col("width") * col("height")).cast("long").as("px"),
          col("n_frames").cast("long").as("n_frames"))
      val active = Video.detectSceneCuts(s, pay).toDF()
        .join(meta, "doc_id")
        .filter(col("n_cuts") >= 1 &&
          col("total_motion") >= lit(6L) * col("px") * (col("n_frames") - 1))
        .select(col("doc_id"), col("n_cuts").cast("long").as("n_cuts"),
          col("total_motion"))
      // Survivor per fp group via groupBy(min), NOT a row_number window
      // over fp: fp has ≤2^12 distinct values, so at corpus scale each fp
      // partition would funnel millions of rows through one task, while
      // the group-min aggregate combines map-side. (r14 ADVICE)
      val keep = Video.fingerprint(s, pay).toDF()
        .join(active.select("doc_id"), "doc_id")
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      gated.select(col("doc_id"), col("lang"), col("n_chars"))
        .join(active, "doc_id").join(keep, "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("n_cuts"), col("total_motion"))
        .orderBy("doc_id")
    },
    Some("""WITH g AS (
              SELECT doc_id, lang, n_chars, text FROM documents
              WHERE lang IN ('en','de','fr') AND n_chars BETWEEN 30 AND 700),
            t AS (SELECT doc_id, lang, n_chars,
                    COALESCE(NULLIF(hex(encode(text)), ''), '00') AS hx,
                    GREATEST(octet_length(encode(text)), 1) AS len FROM g),
            gg AS (SELECT doc_id, lang, n_chars, hx, len, len % 16 + 4 AS w,
                     len % 12 + 4 AS h, len % 10 + 4 AS n FROM t),
            gf AS (SELECT doc_id, hx, len, w, h, n, unnest(range(0, n)) AS f FROM gg),
            gi AS (SELECT doc_id, hx, len, w, h, n, f,
                     unnest(range(0, w * h)) AS i FROM gf),
            pix AS (SELECT doc_id, w, h, n, f, i,
                      (16*(strpos('0123456789ABCDEF', hx[2*(i%len)+1])-1)
                         + (strpos('0123456789ABCDEF', hx[2*(i%len)+2])-1)
                       + 40*(f//4) + (f%4) + 3*i) % 256 AS p
                    FROM gi),
            d2 AS (SELECT doc_id, w, h, n, f, i, p,
                     lag(p) OVER (PARTITION BY doc_id, i ORDER BY f) AS pp
                   FROM pix),
            sad AS (SELECT doc_id, w, h, n, f, sum(abs(p - pp)) AS sad
                    FROM d2 WHERE pp IS NOT NULL GROUP BY doc_id, w, h, n, f),
            act AS (SELECT doc_id,
                      CAST(sum(CASE WHEN sad > 16*w*h THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
                      CAST(sum(sad) AS BIGINT) AS total_motion
                    FROM sad GROUP BY doc_id, w, h, n
                    HAVING sum(CASE WHEN sad > 16*w*h THEN 1 ELSE 0 END) >= 1
                       AND sum(sad) >= 6 * w * h * (n - 1)),
            fs AS (SELECT p.doc_id, p.f, sum(p.p) AS s
                   FROM pix p JOIN act a ON a.doc_id = p.doc_id
                   GROUP BY p.doc_id, p.f),
            fd AS (SELECT doc_id, f, s,
                     lag(s) OVER (PARTITION BY doc_id ORDER BY f) AS sp
                   FROM fs),
            fps AS (SELECT doc_id,
                      CAST(COALESCE(sum(CASE WHEN sp IS NOT NULL AND s >= sp
                        THEN CAST(1 AS BIGINT) << (f - 1) ELSE 0 END), 0) AS BIGINT) AS fp
                    FROM fd GROUP BY doc_id),
            keep AS (SELECT min(doc_id) AS doc_id FROM fps GROUP BY fp)
            SELECT g.doc_id, g.lang, g.n_chars, a.n_cuts, a.total_motion
            FROM g JOIN act a USING (doc_id) JOIN keep USING (doc_id)
            ORDER BY g.doc_id"""),
    // GEN FACE: the same gates and survivor rule over the histogram
    // reduction (see [[histCte]]) — wf/wp/s/sp land in ONE grouped join,
    // sad and the fingerprint bits are arithmetic from there.
    genOracle = Some("""WITH gd AS (
              SELECT doc_id, lang, n_chars, text FROM documents
              WHERE lang IN ('en','de','fr') AND n_chars BETWEEN 30 AND 700),
            t AS (SELECT doc_id, lang, n_chars,
                    COALESCE(NULLIF(hex(encode(text)), ''), '00') AS hx,
                    GREATEST(octet_length(encode(text)), 1) AS len FROM gd),
            g AS (SELECT doc_id, lang, n_chars, hx, len, len % 16 + 4 AS w,
                    len % 12 + 4 AS h, len % 10 + 4 AS n FROM t),
            gi AS (SELECT doc_id, hx, len, w, h, n, unnest(range(0, w * h)) AS i FROM g),
            pq AS (SELECT doc_id, w, h, n,
                     (16*(strpos('0123456789ABCDEF', hx[2*(i%len)+1])-1)
                        + (strpos('0123456789ABCDEF', hx[2*(i%len)+2])-1)
                      + 3*i) % 256 AS q
                   FROM gi),
            hist AS (SELECT doc_id, w, h, n, q, count(*) AS c
                     FROM pq GROUP BY doc_id, w, h, n, q),
            fr AS (SELECT doc_id, w, h, n, unnest(range(1, n)) AS f FROM g),
            wv AS (SELECT fr.doc_id, fr.w, fr.h, fr.n, fr.f,
                     sum(CASE WHEN h2.q >= 256 - (40*(fr.f//4) + (fr.f%4))
                         THEN h2.c ELSE 0 END) AS wf,
                     sum(CASE WHEN h2.q >= 256 - (40*((fr.f-1)//4) + ((fr.f-1)%4))
                         THEN h2.c ELSE 0 END) AS wp,
                     sum(h2.c * h2.q) AS sq
                   FROM fr JOIN hist h2 USING (doc_id)
                   GROUP BY fr.doc_id, fr.w, fr.h, fr.n, fr.f),
            dv AS (SELECT doc_id, w, h, n, f,
                     (CASE WHEN f % 4 = 0 THEN 37 ELSE 1 END) * w * h
                     + (256 - 2*(CASE WHEN f % 4 = 0 THEN 37 ELSE 1 END)) * (wf - wp) AS sad,
                     sq + w*h*(40*(f//4) + (f%4)) - 256*wf AS s,
                     sq + w*h*(40*((f-1)//4) + ((f-1)%4)) - 256*wp AS sp
                   FROM wv),
            act AS (SELECT doc_id,
                      CAST(sum(CASE WHEN sad > 16*w*h THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
                      CAST(sum(sad) AS BIGINT) AS total_motion
                    FROM dv GROUP BY doc_id, w, h, n
                    HAVING sum(CASE WHEN sad > 16*w*h THEN 1 ELSE 0 END) >= 1
                       AND sum(sad) >= 6 * w * h * (n - 1)),
            fps AS (SELECT dv.doc_id,
                      CAST(COALESCE(sum(CASE WHEN dv.s >= dv.sp
                        THEN CAST(1 AS BIGINT) << (dv.f - 1) ELSE 0 END), 0) AS BIGINT) AS fp
                    FROM dv JOIN act USING (doc_id) GROUP BY dv.doc_id),
            keep AS (SELECT min(doc_id) AS doc_id FROM fps GROUP BY fp)
            SELECT g.doc_id, g.lang, g.n_chars, a.n_cuts, a.total_motion
            FROM g JOIN act a USING (doc_id) JOIN keep USING (doc_id)
            ORDER BY g.doc_id""")
  )

  /** INCREMENTAL video curation — the batch face of
    * [[graft.multimodal.Video.curateStream]], run through the streaming
    * operator ITSELF (`flatMapGroupsWithState` executes on batch Datasets
    * with empty state, so the oracled rows exercise the exact code path the
    * micro-batch stream runs): even doc_ids play the already-ingested
    * corpus whose fingerprint set is persisted, odd the arriving clips.
    * Arriving clips decode + motion-gate map-side, then drop (a) any clip
    * whose temporal fingerprint is already in the corpus set and (b) all
    * but the lowest-id clip per new fingerprint. The corpus set rides the
    * closure because it is bounded by CONSTRUCTION at 2^12+1 values (n ≤ 13
    * frames → 12 fp bits) — model state, same class as k-means centroids.
    *
    * The oracle replays decode, gates, bit packing, set membership, and the
    * first-wins rule with the frame difference computed ARITHMETICALLY from
    * the synthesis formula (no per-pixel lag window), so this query replays
    * row-level at gen scale without an override.
    */
  val curationVideoIncremental = Q(
    "x_curation_video_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpusFps = Video
        .fingerprint(s, Video.withVideoPayload(s, docs.filter(col("doc_id") % 2 === 0)))
        .toDF().select("fp").distinct()
        .collect().map(_.getLong(0)).toSet
      Video
        .curateStream(s, Video.withVideoPayload(s, docs.filter(col("doc_id") % 2 === 1)), corpusFps)
        .toDF()
        .select(col("doc_id"), col("fp"),
          col("n_cuts").cast("long").as("n_cuts"), col("total_motion"))
        .orderBy("doc_id")
    },
    Some(geomCte + """,
            gfd AS (SELECT doc_id, hx, len, w, h, n, unnest(range(1, n)) AS f
                    FROM g WHERE doc_id % 2 = 1),
            gid AS (SELECT doc_id, hx, len, w, h, n, f, unnest(range(0, w * h)) AS i
                    FROM gfd),
            pd AS (SELECT doc_id, w, h, n, f,
                     (16*(strpos('0123456789ABCDEF', hx[2*(i%len)+1])-1)
                        + (strpos('0123456789ABCDEF', hx[2*(i%len)+2])-1)
                      + 40*(f//4) + (f%4) + 3*i) % 256 AS p,
                     (16*(strpos('0123456789ABCDEF', hx[2*(i%len)+1])-1)
                        + (strpos('0123456789ABCDEF', hx[2*(i%len)+2])-1)
                      + 40*((f-1)//4) + ((f-1)%4) + 3*i) % 256 AS pp
                   FROM gid),
            sad AS (SELECT doc_id, w, h, n, f, sum(abs(p - pp)) AS sad
                    FROM pd GROUP BY doc_id, w, h, n, f),
            act AS (SELECT doc_id,
                      CAST(sum(CASE WHEN sad > 16*w*h THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
                      CAST(sum(sad) AS BIGINT) AS total_motion
                    FROM sad GROUP BY doc_id, w, h, n
                    HAVING sum(CASE WHEN sad > 16*w*h THEN 1 ELSE 0 END) >= 1
                       AND sum(sad) >= 6 * w * h * (n - 1)),
            gfs AS (SELECT doc_id, hx, len, w, h, n, unnest(range(0, n)) AS f FROM g),
            gis AS (SELECT doc_id, hx, len, w, h, n, f, unnest(range(0, w * h)) AS i
                    FROM gfs),
            fs AS (SELECT doc_id, f,
                     sum((16*(strpos('0123456789ABCDEF', hx[2*(i%len)+1])-1)
                            + (strpos('0123456789ABCDEF', hx[2*(i%len)+2])-1)
                          + 40*(f//4) + (f%4) + 3*i) % 256) AS s
                   FROM gis GROUP BY doc_id, f),
            fd AS (SELECT doc_id, f, s,
                     lag(s) OVER (PARTITION BY doc_id ORDER BY f) AS sp
                   FROM fs),
            fps AS (SELECT doc_id,
                      CAST(COALESCE(sum(CASE WHEN sp IS NOT NULL AND s >= sp
                        THEN CAST(1 AS BIGINT) << (f - 1) ELSE 0 END), 0) AS BIGINT) AS fp
                    FROM fd GROUP BY doc_id),
            corp AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0),
            fresh AS (SELECT a.doc_id, f.fp, a.n_cuts, a.total_motion
                      FROM act a JOIN fps f USING (doc_id)
                      WHERE a.doc_id % 2 = 1
                        AND f.fp NOT IN (SELECT fp FROM corp)),
            keep AS (SELECT min(doc_id) AS doc_id FROM fresh GROUP BY fp)
            SELECT doc_id, fp, n_cuts, total_motion
            FROM fresh JOIN keep USING (doc_id) ORDER BY doc_id"""),
    // GEN FACE: the primary already avoids the lag window but still
    // enumerates every (frame, pixel) row; this face reduces both the
    // arriving-clip motion gate and the corpus fingerprint set to the
    // per-doc histogram (one linear pixel pass for ALL docs). Unlike the
    // batch face (whose lang/length gate prefilters the doc set), this one
    // runs ALL docs — so the frames x 256-bin-histogram join that the batch
    // face tolerates becomes a ~10B-row spill at 5M docs (measured: blew the
    // sandbox's disk at gen100, twice — the per-(doc,q) histogram is itself
    // a ~750M-GROUP aggregate whose hash state spills before the join even
    // starts). The wrap offsets c(f) = 40*(f div 4) + f mod 4 take only 13
    // FIXED values for n <= 13 frames, so the RAW pixel rows fold STRAIGHT
    // to one wide row per doc (suffix counts at those 13 thresholds — a
    // 750M-row -> 5M-group streaming aggregate, no histogram intermediate),
    // and the per-frame wrap counts are CASE lookups on a 1:1 join — linear
    // end to end.
    genOracle = Some(pqCte + """,
            hagg AS (SELECT doc_id, w, h, n, sum(q) AS sq,
                     sum(CASE WHEN q >= 255 THEN 1 ELSE 0 END) AS wt1,
                     sum(CASE WHEN q >= 254 THEN 1 ELSE 0 END) AS wt2,
                     sum(CASE WHEN q >= 253 THEN 1 ELSE 0 END) AS wt3,
                     sum(CASE WHEN q >= 216 THEN 1 ELSE 0 END) AS wt40,
                     sum(CASE WHEN q >= 215 THEN 1 ELSE 0 END) AS wt41,
                     sum(CASE WHEN q >= 214 THEN 1 ELSE 0 END) AS wt42,
                     sum(CASE WHEN q >= 213 THEN 1 ELSE 0 END) AS wt43,
                     sum(CASE WHEN q >= 176 THEN 1 ELSE 0 END) AS wt80,
                     sum(CASE WHEN q >= 175 THEN 1 ELSE 0 END) AS wt81,
                     sum(CASE WHEN q >= 174 THEN 1 ELSE 0 END) AS wt82,
                     sum(CASE WHEN q >= 173 THEN 1 ELSE 0 END) AS wt83,
                     sum(CASE WHEN q >= 136 THEN 1 ELSE 0 END) AS wt120
                   FROM pq GROUP BY doc_id, w, h, n),
            fr AS (SELECT doc_id, w, h, n, unnest(range(1, n)) AS f FROM g),
            wv AS (SELECT fr.doc_id, fr.w, fr.h, fr.n, fr.f, ha.sq,
                     CASE (40*(fr.f//4) + (fr.f%4))
                       WHEN 0 THEN 0 WHEN 1 THEN wt1 WHEN 2 THEN wt2
                       WHEN 3 THEN wt3 WHEN 40 THEN wt40 WHEN 41 THEN wt41
                       WHEN 42 THEN wt42 WHEN 43 THEN wt43 WHEN 80 THEN wt80
                       WHEN 81 THEN wt81 WHEN 82 THEN wt82 WHEN 83 THEN wt83
                       WHEN 120 THEN wt120
                       ELSE error('gen geometry invariant n<=13 violated (wf)')
                     END AS wf,
                     CASE (40*((fr.f-1)//4) + ((fr.f-1)%4))
                       WHEN 0 THEN 0 WHEN 1 THEN wt1 WHEN 2 THEN wt2
                       WHEN 3 THEN wt3 WHEN 40 THEN wt40 WHEN 41 THEN wt41
                       WHEN 42 THEN wt42 WHEN 43 THEN wt43 WHEN 80 THEN wt80
                       WHEN 81 THEN wt81 WHEN 82 THEN wt82 WHEN 83 THEN wt83
                       WHEN 120 THEN wt120
                       ELSE error('gen geometry invariant n<=13 violated (wp)')
                     END AS wp
                   FROM fr JOIN hagg ha USING (doc_id)),
            dv AS (SELECT doc_id, w, h, n, f,
                     (CASE WHEN f % 4 = 0 THEN 37 ELSE 1 END) * w * h
                     + (256 - 2*(CASE WHEN f % 4 = 0 THEN 37 ELSE 1 END)) * (wf - wp) AS sad,
                     sq + w*h*(40*(f//4) + (f%4)) - 256*wf AS s,
                     sq + w*h*(40*((f-1)//4) + ((f-1)%4)) - 256*wp AS sp
                   FROM wv),
            act AS (SELECT doc_id,
                      CAST(sum(CASE WHEN sad > 16*w*h THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
                      CAST(sum(sad) AS BIGINT) AS total_motion
                    FROM dv WHERE doc_id % 2 = 1 GROUP BY doc_id, w, h, n
                    HAVING sum(CASE WHEN sad > 16*w*h THEN 1 ELSE 0 END) >= 1
                       AND sum(sad) >= 6 * w * h * (n - 1)),
            fps AS (SELECT doc_id,
                      CAST(COALESCE(sum(CASE WHEN s >= sp
                        THEN CAST(1 AS BIGINT) << (f - 1) ELSE 0 END), 0) AS BIGINT) AS fp
                    FROM dv GROUP BY doc_id),
            corp AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0),
            fresh AS (SELECT a.doc_id, f.fp, a.n_cuts, a.total_motion
                      FROM act a JOIN fps f USING (doc_id)
                      WHERE a.doc_id % 2 = 1
                        AND f.fp NOT IN (SELECT fp FROM corp)),
            keep AS (SELECT min(doc_id) AS doc_id FROM fresh GROUP BY fp)
            SELECT doc_id, fp, n_cuts, total_motion
            FROM fresh JOIN keep USING (doc_id) ORDER BY doc_id""")
  )

  val qs: Seq[Q] = Seq(videoMeta, videoFrameSample, videoSceneCuts, videoFingerprint,
    curationVideo, curationVideoIncremental)
}
