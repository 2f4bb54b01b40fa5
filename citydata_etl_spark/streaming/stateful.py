"""Custom stateful streaming operator (SURVEY.md §2.7 T2 analog,
BASELINE.json north-star): exact dedup over an unbounded document stream.

applyInPandasWithState keeps, per key-group, the set of content hashes
already emitted; a document passes through only the first time its content
is seen across the whole stream — the streaming twin of exact_dedup's
first-occurrence semantics.

Scale posture (all three state dimensions are bounded):
  - SHARDING: the grouping key is a PREFIX of the content hash, so state
    shards across 16**prefix_len groups independent of corpus size;
  - ENTRY WIDTH: state stores TRUNCATED hashes (state_hash_chars hex chars,
    default 16 = 64 bits — collision odds ~n^2/2^65, negligible against
    real duplicate rates), not the full 64-char digest: 4x less state I/O,
    while the OUTPUT still carries the full sha256;
  - LIFETIME: with ttl_ms set, every state entry carries its last-seen
    processing-time stamp and is PRUNED on every invocation once idle past
    the TTL — so an ACTIVE shard's state is bounded by the distinct
    content seen in any ttl_ms window, not the whole stream (a group-level
    ProcessingTimeTimeout would only ever fire for a shard receiving NO
    data at all, which on a continuous stream is no bound). The group
    timeout stays armed as wholesale cleanup for fully idle shards. A
    sighting of suppressed duplicate content REFRESHES its stamp: an
    entry expires only after ttl_ms with no sighting (sliding window).
    ttl_ms=None keeps exact whole-stream dedup (state follows distinct
    content).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def make_dedup_group(state_hash_chars: int, ttl_ms: int | None):
    """Build the per-group dedup function (module-level factory so tests
    can drive it directly with a fake GroupState)."""

    def dedup_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # fully idle shard past TTL: drop its seen-set wholesale
            state.remove()
            return
        # seen: truncated hash -> last-seen processing-time ms
        if state.exists:
            hashes, stamps = state.get
            seen: dict = dict(zip(hashes, stamps))
        else:
            seen = {}
        now = 0
        if ttl_ms is not None:
            now = state.getCurrentProcessingTimeMs()
            # per-entry expiry runs on EVERY invocation, so an active
            # shard prunes too — the group timeout alone only ever fires
            # for a shard receiving no data at all
            cutoff = now - ttl_ms
            seen = {h: t for h, t in seen.items() if t > cutoff}
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            short = pdf["content_sha"].str.slice(0, state_hash_chars)
            fresh = pdf[~short.isin(seen.keys())]
            first = fresh.drop_duplicates(subset=["content_sha"], keep="first")
            # every sighting — emitted or suppressed — refreshes the
            # stamp: an entry expires only after ttl_ms with NO sighting
            seen.update(dict.fromkeys(short, now))
            if len(first):
                yield first[["doc_id", "text", "content_sha"]]
        ordered = sorted(seen)
        state.update((ordered, [seen[h] for h in ordered]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return dedup_group


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 2,
    state_hash_chars: int = 16,
    ttl_ms: int | None = None,
) -> DataFrame:
    """First-occurrence pass-through over a streaming DataFrame of
    (id, text): emits (id, text, content_sha) once per distinct text.

    Within a micro-batch the minimum id wins (deterministic); across
    batches, arrival order wins (stream semantics). With ttl_ms set, each
    seen-hash expires individually once unseen for ttl_ms (sliding-window
    dedup — active shards prune on every batch, and a fully idle shard is
    dropped wholesale by the group timeout); without it, dedup is exact
    over the whole stream.
    """
    hashed = docs_stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.sha2(F.encode(F.col(text_col), "UTF-8"), 256).alias("content_sha"),
    ).withColumn("shard", F.substring("content_sha", 1, prefix_len))

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return hashed.groupBy("shard").applyInPandasWithState(
        make_dedup_group(state_hash_chars, ttl_ms),
        outputStructType="doc_id LONG, text STRING, content_sha STRING",
        stateStructType="hashes ARRAY<STRING>, stamps ARRAY<BIGINT>",
        outputMode="append",
        timeoutConf=timeout,
    )


def make_session_group(error_gap_s: int, default_gap_s: int):
    """Build the per-user dynamic-gap sessionization function
    (module-level factory so tests can drive it with a fake GroupState).

    State per user: (next_session_id, start, end, n_events, prev_thr) —
    the OPEN session plus the previous event's gap threshold (the gap
    depends on the PREVIOUS event: 'error' shortens it). Events inside
    one invocation are processed in (tsec, event_id) order; a gap
    larger than the previous event's threshold CLOSES the open session
    (emitted) and starts the next. The trailing open session stays in
    state and emits on event-time timeout (watermark passes
    end + prev_thr) — exactly when no future event could extend it.

    This per-user form is the unit-tested SEMANTIC REFERENCE; the
    production path is the shard-keyed make_session_shard_group
    (identical per-user fold and finality rule, per-group machinery
    amortized over users/shard — r18, measured).
    """

    def session_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        def frame(rows):
            return pd.DataFrame(
                rows,
                columns=[
                    "user_id", "session_id", "n_events",
                    "session_start", "session_end",
                ],
            )

        if state.hasTimedOut:
            # watermark passed end + prev_thr: no event can extend the
            # open session any more — flush it. The state is NOT removed:
            # it becomes a TOMBSTONE (start = -1, no open session) so the
            # session counter survives — removing it would restart a
            # returning user at session_id 0, duplicating an emitted id
            # and diverging from the batch twin's cumulative numbering.
            # The tombstone is 5 ints; it garbage-collects via a far
            # timeout (counter-reset after ~1000 days of total silence
            # is the documented boundary of batch equivalence).
            if state.exists:
                sid, start, end, n, prev_thr = state.get
                if start != -1:
                    state.update((int(sid), -1, int(end), 0,
                                  int(prev_thr)))
                    state.setTimeoutTimestamp(
                        state.getCurrentWatermarkMs()
                        + 1000 * 86400 * 1000
                    )
                    yield frame([(user_id, sid, n, start, end)])
                else:
                    state.remove()  # tombstone expired: full gc
            return

        if state.exists:
            sid, start, end, n, prev_thr = state.get
            if start == -1:  # tombstone: counter preserved, nothing open
                start, end, n, prev_thr = None, None, 0, 0
        else:
            sid, start, end, n, prev_thr = -1, None, None, 0, 0

        events = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["tsec", "event_id"]
        )
        closed = []
        for tsec, etype in zip(events["tsec"], events["event_type"]):
            thr = error_gap_s if etype == "error" else default_gap_s
            if start is None or tsec - end > prev_thr:
                if start is not None:
                    closed.append((user_id, sid, n, start, end))
                sid += 1
                start = tsec
                n = 0
            end = tsec
            n += 1
            prev_thr = thr
        state.update((int(sid), int(start), int(end), int(n), int(prev_thr)))
        # event-time timeout at the open session's horizon (ms). The
        # horizon can sit BEHIND the current watermark — a group whose
        # events arrived later than other groups' (the engine rejects a
        # timeout <= watermark) — in which case the session already
        # provably closed: schedule the flush for the very next batch.
        horizon_ms = (int(end) + int(prev_thr)) * 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(horizon_ms, wm_ms + 1))
        if closed:
            yield frame(closed)

    return session_group


def streaming_dynamic_gap_sessions(
    events_stream: DataFrame,
    error_gap_s: int = 300,
    default_gap_s: int = 1800,
    watermark_delay: str = "0 seconds",
    n_shards: int = 64,
) -> DataFrame:
    """Dynamic-gap sessionization over an unbounded event stream — the
    STREAMING twin of operators/aggregates.py:sessionize_dynamic (the
    oracled batch form, t5_dynamic_gap_session): the idle timeout
    depends on the PREVIOUS event ('error' -> error_gap_s, else
    default_gap_s), which session_window(ts, expr) cannot express when
    the gap must ride the lag — hence applyInPandasWithState with
    EVENT-TIME timeouts (the processing-time-timeout companion is
    streaming_exact_dedup).

    Emission contract: a session emits the moment it PROVABLY closed —
    either a later in-order event opened the next session, or the
    watermark passed end + gap (no admissible event can extend it).
    State per user is one open session (5 ints): bounded by active
    users, not history — the property that makes sessionization run
    forever. Input needs (event_id, ts TIMESTAMP, user_id, event_type).

    Output: (user_id, session_id, n_events, session_start, session_end)
    with epoch-second BIGINTs, identical to the batch twin's schema.

    watermark_delay MUST be '0 seconds' (validated): delay 0 makes
    admitted events per-user monotone (an event only passes the
    watermark filter if its ts >= the global max ts of every earlier
    batch >= this user's stored session end), which is what lets state
    hold ONE open session instead of an event buffer. A positive delay
    admits out-of-order events that can land BEHIND the stored session
    end — correct handling then requires buffering events in state
    until the watermark passes and folding the sorted buffer (bounded
    by delay + gap horizon). That buffered variant is a different
    operator, deliberately not silently approximated here: a regressed
    `end` would mis-split sessions and diverge from the batch twin
    without any error.

    State is keyed by pmod(user_id, n_shards) — see
    make_session_shard_group for the measured per-group-machinery
    rationale; per-user session state and fold are unchanged.
    n_shards is part of the state key space: stable for a
    checkpoint's lifetime."""
    delay = watermark_delay.strip().lower()
    if delay not in ("0 seconds", "0 second", "0 minutes", "0 hours"):
        raise ValueError(
            "streaming_dynamic_gap_sessions requires watermark_delay="
            "'0 seconds': a positive delay admits out-of-order events "
            "behind the stored session end, which the one-open-session "
            "state cannot sessionize correctly (see docstring; a "
            "buffered-state variant is the right tool there)"
        )
    prepared = (
        events_stream.withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            F.floor(F.unix_timestamp("ts")).cast("long").alias("tsec"),
            F.col("event_type"),
            F.col("ts"),
            F.pmod(F.col("user_id").cast("long"), F.lit(n_shards))
            .alias("shard"),
        )
    )
    return prepared.groupBy("shard").applyInPandasWithState(
        make_session_shard_group(error_gap_s, default_gap_s),
        outputStructType=(
            "user_id LONG, session_id LONG, n_events LONG, "
            "session_start LONG, session_end LONG"
        ),
        stateStructType="st BINARY",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _pack_events(ts, eid, th) -> bytes:
    """Event buffer -> ONE little-endian int64 blob, laid out as three
    equal sections [ts... | eid... | th...]. Packing the buffer into a
    single BINARY state column (instead of three ARRAY<LONG> columns)
    cuts the per-batch state (de)serialization to one Arrow buffer
    copy each way — measured as the dominant cost of the buffered
    sessionizer — and pins the byte order so state written on one
    architecture reads on any other."""
    import numpy as np

    n = len(ts)
    a = np.empty(3 * n, dtype="<i8")
    a[:n] = ts
    a[n:2 * n] = eid
    a[2 * n:] = th
    return a.tobytes()


def _unpack_events(buf):
    """Inverse of _pack_events -> (ts, eid, th) int64 arrays."""
    import numpy as np

    a = (
        np.frombuffer(buf, dtype="<i8")
        if buf
        else np.empty(0, dtype="<i8")
    )
    n = len(a) // 3
    return a[:n], a[n:2 * n], a[2 * n:]


def _fold_sessions(ts_s, th_s):
    """Sessions over one user's sorted events: (first_idx, last_idx,
    start, end, n, last_thr) per session — the batch twin's fold,
    shared by the per-user reference kernel and the shard kernel."""
    sessions = []
    start_i = start = end = prev_thr = None
    for i, (t, thr) in enumerate(zip(ts_s, th_s)):
        if start is None or t - end > prev_thr:
            if start is not None:
                sessions.append(
                    (start_i, i - 1, start, end, i - start_i, prev_thr)
                )
            start_i, start = i, t
        end = t
        prev_thr = thr
    if start is not None:
        sessions.append(
            (start_i, len(ts_s) - 1, start, end,
             len(ts_s) - start_i, prev_thr)
        )
    return sessions


def make_buffered_session_group(error_gap_s: int, default_gap_s: int):
    """Build the per-user BUFFERED dynamic-gap sessionization function —
    the late-data-correct variant of make_session_group: state holds the
    not-yet-final EVENTS (one packed binary buffer — _pack_events), so
    out-of-order arrivals admitted by a positive watermark delay simply
    land in the buffer and sort into place before folding.

    Finality rule (conservative, provably safe): after sorting the
    buffer by (tsec, event_id) and folding sessions exactly like the
    batch twin, the PREFIX of sessions with end + last_thr < watermark
    emits — any future admissible event has ts >= watermark
    > end + last_thr, so it can neither land inside such a session nor
    within its gap horizon, and emitting a strict prefix keeps session
    ids sequential while the retained suffix stays one contiguous
    buffer. Sessions behind the watermark but still within their gap
    horizon wait for the next batch or the event-time timeout.

    State size is bounded by the events inside the
    (watermark delay + gap horizon) window per user — the price of
    late-data correctness, and exactly the bound a buffering operator
    must pay; the zero-delay fast path (one open session, 5 ints) is
    make_session_group.

    This per-user form is the unit-tested SEMANTIC REFERENCE; the
    production path is the shard-keyed make_buffered_session_shard_group
    (identical per-user math via the shared _fold_sessions, per-group
    machinery amortized over users/shard — r18, measured).
    """

    fold = _fold_sessions

    def session_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        user_id = key[0]
        if state.exists:
            sid, buf = state.get
            ts_buf, eid_buf, th_buf = _unpack_events(buf)
        else:
            sid = -1
            ts_buf, eid_buf, th_buf = _unpack_events(b"")

        if not state.hasTimedOut:
            t_chunks, e_chunks, h_chunks = [ts_buf], [eid_buf], [th_buf]
            for pdf in pdfs:
                t_chunks.append(pdf["tsec"].to_numpy("<i8"))
                e_chunks.append(pdf["event_id"].to_numpy("<i8"))
                h_chunks.append(
                    np.where(
                        pdf["event_type"].to_numpy() == "error",
                        error_gap_s,
                        default_gap_s,
                    ).astype("<i8")
                )
            ts_buf = np.concatenate(t_chunks)
            eid_buf = np.concatenate(e_chunks)
            th_buf = np.concatenate(h_chunks)
        elif not len(ts_buf):
            # the empty-buffer tombstone's far timeout expired with no
            # new events: full gc (mirrors make_session_group's
            # tombstone expiry — without this, the state would re-arm
            # the far timeout forever and leak one entry per user ever
            # seen; counter reset after ~1000 days of total silence is
            # the documented boundary of batch equivalence)
            state.remove()
            return

        w_s = state.getCurrentWatermarkMs() // 1000
        order = np.lexsort((eid_buf, ts_buf))  # ts primary, eid tie-break
        ts_s = ts_buf[order]
        th_s = th_buf[order]
        eid_s = eid_buf[order]

        out = []
        consumed = 0
        next_horizon = None
        for (fi, li, start, end, n, last_thr) in fold(ts_s, th_s):
            if end + last_thr < w_s:
                sid += 1
                out.append((user_id, int(sid), int(n), int(start), int(end)))
                consumed = li + 1
            else:
                next_horizon = int(end) + int(last_thr)
                break

        state.update((
            int(sid),
            _pack_events(
                ts_s[consumed:], eid_s[consumed:], th_s[consumed:]
            ),
        ))
        wm_ms = state.getCurrentWatermarkMs()
        if next_horizon is not None:
            # the first unemitted session's horizon (it may still grow —
            # the timeout only forces a re-evaluation at the earliest
            # moment it COULD become final)
            state.setTimeoutTimestamp(max(next_horizon * 1000, wm_ms + 1))
        else:
            # empty buffer: tombstone preserving the session counter (a
            # returning user must not restart at id 0), gc'd after long
            # total silence — the same boundary t10's operator documents
            state.setTimeoutTimestamp(wm_ms + 1000 * 86400 * 1000)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_id", "n_events",
                    "session_start", "session_end",
                ],
            )

    return session_group


def streaming_late_sessions(
    events_stream: DataFrame,
    watermark_delay: str,
    error_gap_s: int = 300,
    default_gap_s: int = 1800,
    n_shards: int = 64,
) -> DataFrame:
    """Dynamic-gap sessionization that is CORRECT UNDER LATE DATA — the
    buffered-state operator streaming_dynamic_gap_sessions' contract
    points to: a positive watermark delay admits out-of-order events,
    which land in a per-user event buffer inside the state store and
    sort into place before sessions fold; only sessions whose gap
    horizon the watermark has passed emit (provably final — see
    make_buffered_session_group). With every event eventually admitted
    and flushed, the stream's output equals the batch twin
    (sessionize_dynamic) on the full data EXACTLY, which is what the
    oracle checks on a sentinel-closed feed.

    Trade-off vs the zero-delay operator: state per user is the events
    inside the (delay + gap horizon) window, not 5 ints — buffering is
    the price of reordering, pay it only where upstream delivery is
    genuinely out of order (multi-region collectors, retried uploads —
    the reference's Step Functions retry produces exactly such late
    re-deliveries, stepfunction/definition.json:13-23).

    State is keyed by pmod(user_id, n_shards) — the shard-the-key
    posture of streaming_exact_dedup, applied here for the measured
    per-group-machinery reason on make_buffered_session_shard_group;
    per-user buffers, folds, and the finality rule are unchanged.
    n_shards is part of the state key space: stable for a checkpoint's
    lifetime."""
    prepared = (
        events_stream.withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            F.floor(F.unix_timestamp("ts")).cast("long").alias("tsec"),
            F.col("event_type"),
            F.col("ts"),
            F.pmod(F.col("user_id").cast("long"), F.lit(n_shards))
            .alias("shard"),
        )
    )
    return prepared.groupBy("shard").applyInPandasWithState(
        make_buffered_session_shard_group(error_gap_s, default_gap_s),
        outputStructType=(
            "user_id LONG, session_id LONG, n_events LONG, "
            "session_start LONG, session_end LONG"
        ),
        stateStructType="st BINARY",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _attribute_user(t_s, et, cents, lc0, lv0, horizon_us):
    """The per-user last-touch attribution math over ONE user's
    time-sorted events — vectorized RANGE-tie semantics: running max of
    click/view timestamps INCLUDING every row that shares the current
    tus (prefix cummax read at each tus-group's last index), so all
    touches at a timestamp absorb before any purchase at it
    attributes, exactly like the batch twin's RANGE window. Returns
    (attributions for purchase rows, purchase cents, new lc, new lv).
    Shared by the shard kernel below and unit-drivable directly."""
    import numpy as np

    lc_cum = np.maximum.accumulate(
        np.where(et == "click", t_s, np.int64(lc0))
    )
    lv_cum = np.maximum.accumulate(
        np.where(et == "view", t_s, np.int64(lv0))
    )
    last_of_tus = np.searchsorted(t_s, t_s, side="right") - 1
    eff_lc = lc_cum[last_of_tus]
    eff_lv = lv_cum[last_of_tus]
    is_p = et == "purchase"
    plc, plv, pt = eff_lc[is_p], eff_lv[is_p], t_s[is_p]
    click_ok = (plc >= 0) & (plc >= pt - horizon_us)
    view_ok = (plv >= 0) & (plv >= pt - horizon_us)
    att = np.where(
        click_ok & ((plv < 0) | (plc >= plv)),
        "click",
        np.where(view_ok, "view", "organic"),
    )
    n = len(t_s)
    return (
        att,
        cents[is_p],
        int(lc_cum[n - 1]) if n else int(lc0),
        int(lv_cum[n - 1]) if n else int(lv0),
    )


def make_attribution_shard_group(horizon_us: int):
    """SHARD-group kernel for streaming last-touch attribution (t18):
    one state entry holds (latest click, latest view) for EVERY user
    hashing to this shard, packed [n | users(n) | lc(n) | lv(n)] —
    per-user state is still exactly two int64s; the shard level only
    changes where the per-GROUP machinery cost is paid (~1 ms per
    group per batch measured — with 1,500 per-user groups that
    machinery, not the attribution math, was the stateful stage; the
    same shard-the-key posture as streaming_exact_dedup and the t19
    KMV shards). Rows are sorted by (user, tus) once per shard and
    each user's slice runs the SAME _attribute_user math as the
    per-user form; purchases emit immediately, state never grows with
    history."""

    def attribution_shard(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        rows = pd.concat(list(pdfs), ignore_index=True)
        st: dict = {}
        if state.exists:
            (raw,) = state.get
            a = np.frombuffer(raw, dtype="<i8")
            n = int(a[0]) if len(a) else 0
            for i in range(n):
                st[int(a[1 + i])] = (
                    int(a[1 + n + i]),
                    int(a[1 + 2 * n + i]),
                )
        uid = rows["user_id"].to_numpy(dtype=np.int64)
        tus = rows["tus"].to_numpy(dtype=np.int64)
        et_all = rows["event_type"].to_numpy()
        # cents is only consumed for purchase rows, but the int64
        # conversion runs over the whole column — a null on any
        # non-purchase event must not kill the query, so fill first
        cents_all = rows["cents"].fillna(0).to_numpy(dtype=np.int64)
        order = np.lexsort((tus, uid))  # user primary, tus secondary
        uid, tus = uid[order], tus[order]
        et_all, cents_all = et_all[order], cents_all[order]
        uniq, starts = np.unique(uid, return_index=True)
        ends = np.append(starts[1:], len(uid))
        out_u, out_a, out_c = [], [], []
        for u, a0, b0 in zip(uniq, starts, ends):
            lc0, lv0 = st.get(int(u), (-1, -1))
            att, pc, lc, lv = _attribute_user(
                tus[a0:b0], et_all[a0:b0], cents_all[a0:b0],
                lc0, lv0, horizon_us,
            )
            st[int(u)] = (lc, lv)
            if len(att):
                out_u.append(np.full(len(att), u, np.int64))
                out_a.append(att)
                out_c.append(pc)
        keys = sorted(st)
        blob = np.concatenate(
            [
                np.array([len(keys)], np.int64),
                np.array(keys, np.int64),
                np.array([st[u][0] for u in keys], np.int64),
                np.array([st[u][1] for u in keys], np.int64),
            ]
        ).astype("<i8")
        state.update((blob.tobytes(),))
        if out_u:
            yield pd.DataFrame(
                {
                    "user_id": np.concatenate(out_u),
                    "attribution": pd.array(
                        np.concatenate(out_a), dtype="string"
                    ),
                    "cents": np.concatenate(out_c),
                }
            )

    return attribution_shard


def streaming_last_touch_attribution(
    events_stream: DataFrame, horizon_us: int = 3_600_000_000,
    n_shards: int = 64,
) -> DataFrame:
    """STREAMING last-touch attribution — the unbounded-stream twin of
    a22_attribution: every purchase is credited the moment it arrives,
    against per-user state of just two timestamps (latest click, latest
    view). The batch form scans history with a RANGE-frame running
    max; this form carries the same two values forward across
    micro-batches, so output equals the batch twin EXACTLY when each
    user's feed is time-monotone AND equal-timestamp peers arrive in
    the SAME micro-batch. The second condition is real: watermark-0
    admission is non-strict (ts >= max seen admits a tie), and a
    click at tus T landing one batch AFTER a purchase at T attributes
    that purchase against pre-tie state — the batch twin's RANGE
    frame would have credited the click, and an already-emitted row
    cannot be revised. A bounded time-ordered replay (ties sort
    together) satisfies both conditions; feeds that can straddle ties
    or deliver behind a user's max need the buffered variant (see
    streaming_dynamic_gap_sessions' discussion) — not silently
    approximated here.

    Input: (user_id, event_type, tus BIGINT epoch-micros, cents BIGINT).
    Output: one row per purchase (user_id, attribution, cents),
    append-mode; aggregate downstream as you would any fact stream.
    State: 2 int64s per user ever seen — at 100 TB, bounded by users,
    not events; idle-user eviction would add a ProcessingTimeTimeout
    exactly as streaming_exact_dedup's TTL does. State is keyed by
    pmod(user_id, n_shards) — see make_attribution_shard_group for the
    measured per-group-machinery rationale; n_shards is part of the
    state key space and must be stable for a checkpoint's lifetime."""
    sharded = events_stream.withColumn(
        "shard", F.pmod(F.col("user_id"), F.lit(n_shards))
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        make_attribution_shard_group(horizon_us),
        outputStructType="user_id LONG, attribution STRING, cents LONG",
        stateStructType="st BINARY",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def make_kmv_shard_group(k: int):
    """SHARD-group kernel for streaming sliding-window KMV distinct
    (t19): one state entry holds the k-min buffers of EVERY slot
    hashing to this shard, packed into a single int64 blob
    [n | slots(n) | upds(n) | lens(n) | buffers...].

    Why shards and not per-slot groups (r18 optimization, measured):
    applyInPandasWithState pays ~0.15-1 ms of per-GROUP machinery per
    batch (Arrow state row (de)serialization, GroupState construction,
    per-group pandas frames) — with 8,640 time-slot groups at sf0.1
    that machinery WAS the stateful stage (addBatch 1.32 s for 100k
    rows). Sharding amortizes it over slots/shard groups while the
    per-slot math is unchanged: each slot's buffer is still the
    sorted distinct union of (stored buffer, new hashes) truncated to
    the k smallest — lossless by the same pigeonhole as the batch
    twin's slot-merge — and emits stamped with its own per-slot
    update sequence exactly when the slot receives data (matching the
    per-slot-group form's invocation rule). The same shard-the-key
    posture as streaming_exact_dedup's hash-prefix groups; state per
    shard stays bounded at slots/shard x k int64s."""

    def kmv_shard(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        s_l, h_l = [], []
        for p in pdfs:
            s_l.append(p["slot"].to_numpy(np.int64))
            h_l.append(p["hv"].to_numpy(np.int64))
        s_in = (
            np.concatenate(s_l) if s_l else np.empty(0, np.int64)
        )
        h_in = (
            np.concatenate(h_l) if h_l else np.empty(0, np.int64)
        )
        bufs: dict = {}
        if state.exists:
            (raw,) = state.get
            st = np.frombuffer(raw, dtype="<i8")
            n = int(st[0]) if len(st) else 0
            slots = st[1 : 1 + n]
            upds = st[1 + n : 1 + 2 * n]
            lens = st[1 + 2 * n : 1 + 3 * n]
            offs = np.concatenate(([0], np.cumsum(lens)))
            data = st[1 + 3 * n :]
            for i in range(n):
                bufs[int(slots[i])] = (
                    int(upds[i]),
                    data[offs[i] : offs[i + 1]],
                )
        order = np.argsort(s_in, kind="stable")
        s_s, h_s = s_in[order], h_in[order]
        uniq, starts = np.unique(s_s, return_index=True)
        ends = np.append(starts[1:], len(s_s))
        out_s, out_u, out_h = [], [], []
        for s, a, b in zip(uniq, starts, ends):
            upd0, old = bufs.get(int(s), (0, np.empty(0, np.int64)))
            buf = np.unique(np.concatenate([old, h_s[a:b]]))[:k]
            upd = upd0 + 1
            bufs[int(s)] = (upd, buf)
            out_s.append(np.full(len(buf), s, np.int64))
            out_u.append(np.full(len(buf), upd, np.int64))
            out_h.append(buf)
        keys = sorted(bufs)
        lens2 = np.array([len(bufs[s][1]) for s in keys], np.int64)
        blob = np.concatenate(
            [
                np.array([len(keys)], np.int64),
                np.array(keys, np.int64),
                np.array([bufs[s][0] for s in keys], np.int64),
                lens2,
            ]
            + [bufs[s][1] for s in keys]
        ).astype("<i8")
        state.update((blob.tobytes(),))
        if out_s:
            yield pd.DataFrame(
                {
                    "slot": np.concatenate(out_s),
                    "upd": np.concatenate(out_u),
                    "hv": np.concatenate(out_h),
                }
            )

    return kmv_shard


def streaming_slot_kmv(
    stream: DataFrame, k: int = 64, n_shards: int = 64
) -> DataFrame:
    """STREAMING per-slot k-minimum-values buffers — the stateful half
    of the sliding-window distinct sketch (t19): input (slot LONG,
    hv LONG) rows, state of AT MOST k int64s per slot regardless of
    slot cardinality (the whole point vs exact streaming distinct,
    whose state grows with true cardinality). Output: the slot's
    current buffer every micro-batch it receives data, stamped with a
    per-slot update sequence; the window merge (slot buffers -> window
    k-mins -> estimate) is plain batch algebra over k-row buffers
    downstream.

    State is keyed by pmod(slot, n_shards) — many slots per state
    entry — because per-group machinery, not per-slot math, dominated
    the per-slot-group form (see make_kmv_shard_group). n_shards must
    be stable for a checkpoint's lifetime (it is the state key space)
    and sized a few times the state-partition count so every partition
    carries work; 64 covers the 16-partition posture with 4 groups per
    partition and keeps slots/shard high (135 at sf0.1's 8,640 slots,
    growing with the window span at scale — amortization only
    improves)."""
    sharded = stream.withColumn(
        "shard", F.pmod(F.col("slot"), F.lit(n_shards))
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        make_kmv_shard_group(k),
        outputStructType="slot LONG, upd LONG, hv LONG",
        stateStructType="buf BINARY",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_FAR_MS = 1000 * 86400 * 1000  # the documented ~1000-day gc boundary

_SESSION_COLS = [
    "user_id", "session_id", "n_events", "session_start", "session_end",
]


def make_session_shard_group(error_gap_s: int, default_gap_s: int):
    """SHARD-group kernel for zero-delay dynamic-gap sessionization
    (t10) — the per-user reference semantics of make_session_group with
    state keyed by pmod(user_id, n_shards): one blob
    [n | uid | sid | start | end | n_ev | prev_thr | gc_ms] (7 int64 a
    user; start = -1 marks the counter-preserving tombstone, gc_ms its
    ~1000-day expiry) instead of one 5-int state row per user. Measured
    rationale: per-GROUP machinery (~1 ms/group/batch) dominated the
    1,500-user-group form — both its data pass AND its timeout pass
    (the empty flush batch alone cost 1.7 s); the per-user fold is
    byte-identical.

    Timeout semantics: the engine timeout is armed at the MINIMUM over
    the shard's users of (open-session horizon, tombstone expiry),
    clamped past the watermark, and EVERY invocation (data or timeout)
    runs the flush rule over every user in the shard: an open session
    whose horizon lies strictly behind the watermark is provably final
    (no admissible event can extend it — delay-0 admission) and emits
    exactly once, becoming a tombstone. This can emit a session one
    batch EARLIER than the per-user form's own timeout would have (the
    shard is invoked whenever any of its users needs attention); the
    emitted SET is identical because the rule `horizon < watermark` is
    the same one the per-user timeout path applies, and a flushed
    session is consumed from state."""

    def session_shard(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        users: dict = {}  # uid -> [sid, start, end, n_ev, prev_thr, gc]
        if state.exists:
            (raw,) = state.get
            a = np.frombuffer(raw, dtype="<i8")
            n = int(a[0]) if len(a) else 0
            for i in range(n):
                users[int(a[1 + i])] = [
                    int(a[1 + n * j + i]) for j in range(1, 7)
                ]
        wm_ms = state.getCurrentWatermarkMs()
        out = []
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            uid = rows["user_id"].to_numpy(np.int64)
            ts = rows["tsec"].to_numpy(np.int64)
            eid = rows["event_id"].to_numpy(np.int64)
            th = np.where(
                rows["event_type"].to_numpy() == "error",
                error_gap_s,
                default_gap_s,
            ).astype(np.int64)
            order = np.lexsort((eid, ts, uid))
            uid, ts, th = uid[order], ts[order], th[order]
            uniq, starts = np.unique(uid, return_index=True)
            ends = np.append(starts[1:], len(uid))
            for u, a0, b0 in zip(uniq, starts, ends):
                sid, start, end, nev, prev_thr, _gc = users.get(
                    int(u), [-1, -1, 0, 0, 0, 0]
                )
                if start == -1:  # fresh user or tombstone: nothing open
                    start = None
                for t, thr in zip(ts[a0:b0], th[a0:b0]):
                    if start is None or t - end > prev_thr:
                        if start is not None:
                            out.append((int(u), sid, nev, start, end))
                        sid += 1
                        start = int(t)
                        nev = 0
                    end = int(t)
                    nev += 1
                    prev_thr = int(thr)
                users[int(u)] = [sid, start, end, nev, prev_thr, 0]
        # flush pass over EVERY user, every invocation: emit open
        # sessions whose horizon the watermark strictly passed (the
        # per-user form's timeout rule), gc expired tombstones
        for u, st in list(users.items()):
            sid, start, end, nev, prev_thr, gc = st
            if start != -1:
                if (end + prev_thr) * 1000 < wm_ms:
                    out.append((u, sid, nev, start, end))
                    users[u] = [sid, -1, end, 0, prev_thr, wm_ms + _FAR_MS]
            elif gc and gc < wm_ms:
                del users[u]
        if users:
            keys = sorted(users)
            blob = np.concatenate(
                [np.array([len(keys)], np.int64),
                 np.array(keys, np.int64)]
                + [
                    np.array([users[u][j] for u in keys], np.int64)
                    for j in range(6)
                ]
            ).astype("<i8")
            state.update((blob.tobytes(),))
            cands = [
                max((st[2] + st[4]) * 1000, wm_ms + 1)
                if st[1] != -1
                else st[5]
                for st in users.values()
            ]
            state.setTimeoutTimestamp(max(min(cands), wm_ms + 1))
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out, columns=_SESSION_COLS)

    return session_shard


def make_buffered_session_shard_group(error_gap_s: int, default_gap_s: int):
    """SHARD-group kernel for late-data-correct buffered sessionization
    (t12) — make_buffered_session_group's per-user semantics (the
    shared _fold_sessions fold, the identical strict
    `end + last_thr < floor(watermark)` prefix-finality rule) with
    state keyed by pmod(user_id, n_shards): one blob
    [n | uid(n) | sid(n) | gc_ms(n) | buflen(n) | packed buffers...]
    where each buffer is _pack_events' [ts|eid|th] int64 triple layout.
    Per-group machinery dominated the per-user form (4 batches x
    ~1,500 groups x ~0.7 ms); the shard form pays it 4 x n_shards
    times while every per-user sort/fold/prefix-emit is unchanged.
    Every invocation re-evaluates every user in the shard (data merge
    for users with rows, then the flush rule for all) — emission can
    land a batch earlier than the per-user timeout would fire, the
    emitted set is identical (prefix-consume-once, same finality
    rule). Empty-buffer users keep their session counter as
    tombstones until the ~1000-day gc boundary, as documented on the
    per-user form."""

    def session_shard(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        users: dict = {}  # uid -> [sid, gc_ms, ts_arr, eid_arr, th_arr]
        if state.exists:
            (raw,) = state.get
            a = np.frombuffer(raw, dtype="<i8")
            n = int(a[0]) if len(a) else 0
            uids = a[1 : 1 + n]
            sids = a[1 + n : 1 + 2 * n]
            gcs = a[1 + 2 * n : 1 + 3 * n]
            lens = a[1 + 3 * n : 1 + 4 * n]  # events per buffer
            offs = np.concatenate(([0], np.cumsum(lens * 3)))
            data = a[1 + 4 * n :]
            for i in range(n):
                seg = data[offs[i] : offs[i + 1]]
                m = lens[i]
                users[int(uids[i])] = [
                    int(sids[i]), int(gcs[i]),
                    seg[:m], seg[m : 2 * m], seg[2 * m :],
                ]
        wm_ms = state.getCurrentWatermarkMs()
        w_s = wm_ms // 1000
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            uid = rows["user_id"].to_numpy(np.int64)
            ts = rows["tsec"].to_numpy(np.int64)
            eid = rows["event_id"].to_numpy(np.int64)
            th = np.where(
                rows["event_type"].to_numpy() == "error",
                error_gap_s,
                default_gap_s,
            ).astype(np.int64)
            order = np.argsort(uid, kind="stable")
            uid, ts, eid, th = (
                uid[order], ts[order], eid[order], th[order]
            )
            uniq, starts = np.unique(uid, return_index=True)
            ends = np.append(starts[1:], len(uid))
            for u, a0, b0 in zip(uniq, starts, ends):
                sid, gc, bt, be, bh = users.get(
                    int(u),
                    [-1, 0, np.empty(0, np.int64),
                     np.empty(0, np.int64), np.empty(0, np.int64)],
                )
                users[int(u)] = [
                    sid, 0,
                    np.concatenate([bt, ts[a0:b0]]),
                    np.concatenate([be, eid[a0:b0]]),
                    np.concatenate([bh, th[a0:b0]]),
                ]
        out = []
        cands = []  # per-user timeout candidates, gathered during flush
        for u, st in list(users.items()):
            sid, gc, bt, be, bh = st
            if not len(bt):
                if gc and gc < wm_ms:
                    del users[u]
                else:
                    cands.append(gc)
                continue
            order = np.lexsort((be, bt))  # ts primary, eid tie-break
            ts_s, eid_s, th_s = bt[order], be[order], bh[order]
            consumed = 0
            next_horizon = None
            for (fi, li, start, end, nv, last_thr) in _fold_sessions(
                ts_s, th_s
            ):
                if end + last_thr < w_s:
                    sid += 1
                    out.append((u, sid, nv, int(start), int(end)))
                    consumed = li + 1
                else:
                    next_horizon = int(end) + int(last_thr)
                    break
            gc = (wm_ms + _FAR_MS) if next_horizon is None else 0
            users[u] = [
                sid, gc,
                ts_s[consumed:], eid_s[consumed:], th_s[consumed:],
            ]
            cands.append(
                gc
                if next_horizon is None
                else max(next_horizon * 1000, wm_ms + 1)
            )
        if users:
            keys = sorted(users)
            lens2 = np.array(
                [len(users[u][2]) for u in keys], np.int64
            )
            parts = [
                np.array([len(keys)], np.int64),
                np.array(keys, np.int64),
                np.array([users[u][0] for u in keys], np.int64),
                np.array([users[u][1] for u in keys], np.int64),
                lens2,
            ]
            for u in keys:
                parts += [users[u][2], users[u][3], users[u][4]]
            state.update(
                (np.concatenate(parts).astype("<i8").tobytes(),)
            )
            state.setTimeoutTimestamp(max(min(cands), wm_ms + 1))
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out, columns=_SESSION_COLS)

    return session_shard
