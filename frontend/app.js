// audio-rag-tpu web client (dependency-free).
// Parity surface: reference frontend/src (React): Search / Upload with job
// polling / mic → 16 kHz PCM → WebSocket streaming (client.js:1-72,
// StreamingMic.jsx) — as a single vanilla-JS page served by the API itself.

const $ = (id) => document.getElementById(id);
const api = () => ({ "X-API-Key": $("apiKey").value });

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
  const r = await fetch("/api/v1/query", {
    method: "POST",
    headers: { ...api(), "Content-Type": "application/json" },
    body: JSON.stringify(body),
  });
  if (!r.ok) {
    $("results").innerHTML =
      `<div class='card'>error ${r.status}: ${await r.text()}</div>`;
    return;
  }
  const data = await r.json();
  if (data.answer) {
    $("answerCard").classList.remove("hidden");
    $("answerCard").innerHTML =
      `<div class="meta">answer · ${(data.elapsed_s * 1000).toFixed(0)} ms</div>` +
      `<div>${data.answer}</div>`;
  }
  $("results").innerHTML = data.results
    .map(
      (x) => `<div class="card">
        <div class="meta">
          <span class="score">${x.score.toFixed(3)}</span>
          ${x.speaker ?? "speaker?"} · ${fmtTime(x.start)}–${fmtTime(x.end)}
        </div>${x.text}</div>`
    )
    .join("") || "<div class='card'>no results</div>";
}

// ---- upload + job polling -------------------------------------------
$("goUpload").addEventListener("click", async () => {
  const f = $("file").files[0];
  if (!f) return alert("choose an audio file first");
  const form = new FormData();
  form.append("file", f);
  form.append("priority", $("priority").value);
  const r = await fetch("/api/v1/ingest", {
    method: "POST", headers: api(), body: form,
  });
  const data = await r.json();
  if (!r.ok) return alert(JSON.stringify(data));
  trackJob(data.job_id, f.name);
});

function trackJob(jobId, name) {
  const el = document.createElement("div");
  el.className = "card";
  $("jobs").prepend(el);
  const tick = async () => {
    const r = await fetch(`/api/v1/jobs/${jobId}`, { headers: api() });
    const s = await r.json();
    el.innerHTML =
      `<div class="meta">${name} · ${s.status} · ${s.stage ?? ""}</div>
       <progress max="1" value="${s.progress}"></progress>` +
      (s.result
        ? ` <span class="meta">${s.result.num_chunks} chunks, ` +
          `${s.result.num_speakers} speakers</span>`
        : "");
    if (["completed", "failed", "cancelled"].includes(s.status)) {
      refreshCollections();
      return;
    }
    setTimeout(tick, 1500);
  };
  tick();
}

// ---- live streaming (mic → 16 kHz PCM16 → WS) ------------------------
let streaming = null;
$("micBtn").addEventListener("click", async () => {
  if (streaming) { stopStream(); return; }
  const media = await navigator.mediaDevices.getUserMedia({ audio: true });
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
      $("transcript").textContent +=
        `[${fmtTime(m.start)}] ${m.text}\n`;
    } else if (m.type === "status") {
      $("streamState").textContent = m.status;
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
});

function stopStream() {
  const s = streaming;
  streaming = null;
  try { s.ws.send(JSON.stringify({ command: "stop" })); } catch {}
  setTimeout(() => s.ws.close(), 500);
  s.proc.disconnect(); s.ctx.close();
  s.media.getTracks().forEach((t) => t.stop());
  $("micBtn").textContent = "🎙 Start microphone";
  $("streamState").textContent = "stopped";
}
