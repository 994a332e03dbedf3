// audio-rag-tpu web client (dependency-free).
// Parity surface: reference frontend/src (React): Search with result
// cards / Upload with job progress view / mic → 16 kHz PCM → WebSocket
// streaming with live partial rendering (client.js:1-72,
// StreamingMic.jsx) — as a single vanilla-JS page served by the API.
// Every fetch/WS route used here is driven by
// tests/integration/test_frontend.py (route-contract test included).

const $ = (id) => document.getElementById(id);
const api = () => ({ "X-API-Key": $("apiKey").value });
// HTML-escape for anything interpolated into innerHTML that the server or
// the user controls (error details, filenames, transcript text) — stored/
// reflected XSS otherwise.
const esc = (s) =>
  String(s).replace(/[&<>"']/g, (c) => (
    { "&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "'": "&#39;" }[c]
  ));

// mirror of jobqueue/job.py STAGE_ORDER — powers the progress stepper
const STAGES = [
  "validating", "transcribing", "diarizing", "aligning", "chunking",
  "contextualizing", "embedding", "indexing", "finalizing",
];

// ---- errors ----------------------------------------------------------
function showError(msg) {
  const el = document.createElement("div");
  el.className = "toast";
  el.textContent = msg;
  $("toasts").appendChild(el);
  setTimeout(() => el.remove(), 6000);
}

async function apiError(r) {
  let detail = "";
  try { detail = (await r.json()).detail ?? ""; } catch {}
  if (r.status === 429) return `rate limited — retry shortly. ${detail}`;
  if (r.status === 401 || r.status === 403)
    return `auth failed (${r.status}) — check the API key. ${detail}`;
  return `error ${r.status}: ${detail}`;
}

// ---- tabs ------------------------------------------------------------
document.querySelectorAll(".tab").forEach((b) =>
  b.addEventListener("click", () => {
    document.querySelectorAll(".tab").forEach((x) => x.classList.remove("active"));
    document.querySelectorAll(".panel").forEach((x) => x.classList.remove("active"));
    b.classList.add("active");
    $(b.dataset.tab).classList.add("active");
  })
);

// ---- health + collections -------------------------------------------
async function refreshHealth() {
  try {
    const r = await fetch("/health/ready");
    const ok = r.ok;
    $("health").textContent = ok ? "ready" : "not ready";
    $("health").classList.toggle("ok", ok);
  } catch {
    $("health").textContent = "offline";
  }
}
async function refreshCollections() {
  try {
    const r = await fetch("/api/v1/collections", { headers: api() });
    if (!r.ok) return;
    const { collections } = await r.json();
    const sel = $("collection");
    sel.innerHTML = '<option value="">default collection</option>';
    for (const c of collections) {
      const o = document.createElement("option");
      o.value = c.name;
      o.textContent = `${c.name} (${c.count})`;
      sel.appendChild(o);
    }
  } catch {}
}
$("deleteCollection").addEventListener("click", async () => {
  const name = $("collection").value;
  if (!name) return showError("pick a collection to delete");
  if (!confirm(`Delete collection "${name}"?`)) return;
  const r = await fetch(`/api/v1/collections/${encodeURIComponent(name)}`, {
    method: "DELETE", headers: api(),
  });
  if (!r.ok) return showError(await apiError(r));
  showError(`deleted ${name}`);
  refreshCollections();
});
refreshHealth();
refreshCollections();
setInterval(refreshHealth, 10000);

// ---- search ----------------------------------------------------------
const fmtTime = (s) => {
  const m = Math.floor(s / 60), ss = Math.floor(s % 60);
  return `${String(m).padStart(2, "0")}:${String(ss).padStart(2, "0")}`;
};

$("goSearch").addEventListener("click", runSearch);
$("query").addEventListener("keydown", (e) => e.key === "Enter" && runSearch());

async function runSearch() {
  const body = {
    query: $("query").value,
    search_type: $("searchType").value,
    generate_answer: $("genAnswer").checked,
    use_hyde: $("useHyde").checked,
    top_k: 5,
  };
  if ($("collection").value) body.collection = $("collection").value;
  $("results").innerHTML = "<div class='card'>searching…</div>";
  $("answerCard").classList.add("hidden");
  let r;
  try {
    r = await fetch("/api/v1/query", {
      method: "POST",
      headers: { ...api(), "Content-Type": "application/json" },
      body: JSON.stringify(body),
    });
  } catch (e) {
    $("results").innerHTML = "";
    return showError(`network error: ${e.message}`);
  }
  if (!r.ok) {
    const msg = await apiError(r);
    $("results").innerHTML = `<div class='card error'>${esc(msg)}</div>`;
    return showError(msg);
  }
  const data = await r.json();
  if (data.answer) {
    $("answerCard").classList.remove("hidden");
    $("answerCard").innerHTML =
      `<div class="meta">answer · ${(data.elapsed_s * 1000).toFixed(0)} ms</div>` +
      `<div>${esc(data.answer)}</div>`;
  }
  $("results").innerHTML = data.results
    .map(
      (x) => `<div class="card">
        <div class="meta">
          <span class="score">${x.score.toFixed(3)}</span>
          ${esc(x.speaker ?? "speaker?")} · ${fmtTime(x.start)}–${fmtTime(x.end)}
        </div>${esc(x.text)}</div>`
    )
    .join("") || "<div class='card'>no results</div>";
}

// ---- upload + job progress (stage stepper off the stage enum) --------
$("goUpload").addEventListener("click", async () => {
  const f = $("file").files[0];
  if (!f) return showError("choose an audio file first");
  const form = new FormData();
  form.append("file", f);
  form.append("priority", $("priority").value);
  if ($("collection").value) form.append("collection", $("collection").value);
  let r;
  try {
    r = await fetch("/api/v1/ingest", {
      method: "POST", headers: api(), body: form,
    });
  } catch (e) {
    return showError(`upload failed: ${e.message}`);
  }
  if (!r.ok) return showError(await apiError(r));
  const data = await r.json();
  trackJob(data.job_id, f.name);
});

function stepper(stage, status) {
  const cur = STAGES.indexOf(stage);
  return `<div class="stepper">` + STAGES.map((s, i) => {
    let cls = "step";
    if (status === "completed" || i < cur) cls += " done";
    else if (i === cur && status === "running") cls += " current";
    else if (i === cur && status === "failed") cls += " failed";
    return `<span class="${cls}" title="${s}">${s.slice(0, 5)}</span>`;
  }).join("") + `</div>`;
}

function trackJob(jobId, name) {
  const el = document.createElement("div");
  el.className = "card";
  $("jobs").prepend(el);
  let done = false;
  const tick = async () => {
    let s;
    try {
      const r = await fetch(`/api/v1/jobs/${jobId}`, { headers: api() });
      if (!r.ok) {
        el.innerHTML =
          `<div class="meta error">${esc(name)} · ${esc(await apiError(r))}</div>`;
        return;
      }
      s = await r.json();
    } catch (e) {
      el.innerHTML =
        `<div class="meta error">${esc(name)} · ${esc(e.message)}</div>`;
      return;
    }
    const cancelBtn = done ? "" :
      `<button class="mini" data-cancel="${jobId}">cancel</button>`;
    el.innerHTML =
      `<div class="meta">${esc(name)} · <b>${esc(s.status)}</b> ${cancelBtn}</div>` +
      stepper(s.stage, s.status) +
      `<progress max="1" value="${s.progress}"></progress>` +
      (s.status === "failed"
        ? `<div class="error">${esc(s.error ?? "ingestion failed")}</div>` : "") +
      (s.result
        ? ` <span class="meta">${s.result.num_chunks} chunks, ` +
          `${s.result.num_speakers} speakers, ` +
          `${(s.result.duration_s ?? 0).toFixed(0)} s audio</span>`
        : "");
    const btn = el.querySelector("[data-cancel]");
    if (btn) btn.addEventListener("click", async () => {
      const r = await fetch(`/api/v1/jobs/${jobId}`, {
        method: "DELETE", headers: api(),
      });
      if (!r.ok) showError(await apiError(r));
    });
    if (["completed", "failed", "cancelled"].includes(s.status)) {
      done = true;
      refreshCollections();
      el.querySelector("[data-cancel]")?.remove();
      return;
    }
    setTimeout(tick, 1500);
  };
  tick();
}

// ---- live streaming (mic → 16 kHz PCM16 → WS) ------------------------
// partial results render in-place on a pending line; finals commit to
// the transcript (reference StreamingMic.jsx interim/final behavior)
let streaming = null;
$("micBtn").addEventListener("click", async () => {
  if (streaming) { stopStream(); return; }
  let media;
  try {
    media = await navigator.mediaDevices.getUserMedia({ audio: true });
  } catch (e) {
    return showError(`microphone unavailable: ${e.message}`);
  }
  const ctx = new AudioContext();
  const src = ctx.createMediaStreamSource(media);
  const proc = ctx.createScriptProcessor(4096, 1, 1);
  const ratio = ctx.sampleRate / 16000;
  const ws = new WebSocket(
    `${location.protocol === "https:" ? "wss" : "ws"}://${location.host}` +
    `/api/v1/ws/transcribe?api_key=${encodeURIComponent($("apiKey").value)}`
  );
  ws.onmessage = (e) => {
    const m = JSON.parse(e.data);
    if (m.type === "transcript") {
      if (m.is_final === false) {
        $("partial").textContent = m.text;          // live partial line
      } else {
        $("partial").textContent = "";
        $("transcript").textContent +=
          `[${fmtTime(m.start)}] ${m.text}\n`;
      }
    } else if (m.type === "status") {
      $("streamState").textContent = m.status;
      $("streamState").classList.remove("error");
    } else if (m.type === "error") {
      $("streamState").textContent = "error";
      $("streamState").classList.add("error");
      showError(`streaming: ${m.detail ?? m.message ?? "unknown error"}`);
    }
  };
  ws.onerror = () => showError("websocket error — is the server up?");
  ws.onclose = (e) => {
    if (streaming && e.code !== 1000) {
      showError(`stream closed (${e.code})`);
      stopStream();
    }
  };
  proc.onaudioprocess = (e) => {
    if (ws.readyState !== 1) return;
    const input = e.inputBuffer.getChannelData(0);
    const out = new Int16Array(Math.floor(input.length / ratio));
    for (let i = 0; i < out.length; i++) {
      const v = input[Math.floor(i * ratio)];
      out[i] = Math.max(-1, Math.min(1, v)) * 32767;
    }
    ws.send(out.buffer);
  };
  src.connect(proc);
  proc.connect(ctx.destination);
  streaming = { media, ctx, proc, ws };
  $("micBtn").textContent = "⏹ Stop";
  $("transcript").textContent = "";
  $("partial").textContent = "";
});

function stopStream() {
  const s = streaming;
  if (!s) return;
  streaming = null;
  try { s.ws.send(JSON.stringify({ command: "stop" })); } catch {}
  setTimeout(() => s.ws.close(), 500);
  s.proc.disconnect(); s.ctx.close();
  s.media.getTracks().forEach((t) => t.stop());
  $("micBtn").textContent = "🎙 Start microphone";
  $("streamState").textContent = "stopped";
}
