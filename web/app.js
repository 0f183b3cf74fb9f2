/* Detection dashboard: WebSocket detections -> canvas overlays on MJPEG
 * feeds, grid/single view with layout presets, HBM gauge, per-camera FPS
 * badges, session stats panel. Counterpart of the reference's web/app.js
 * DetectionApp (WS client :423, overlay renderer :632, MJPEG feeds :571,
 * view layouts :423-700, GPU gauge :49), reimplemented for the TPU stack. */
"use strict";

class DetectionApp {
  constructor() {
    this.cameras = new Map();        // id -> {el, canvas, ctx, ...}
    this.sessionDetections = 0;
    this.sessionByClass = new Map(); // class/species -> count
    this.msgTimes = [];              // WS message timestamps (rate)
    this.ws = null;
    this.wsRetryMs = 1000;
    this.zones = new Map();          // camera_id -> [{name, points}]
    this.editZones = false;          // zone-editor mode
    this.draft = null;               // {camId, points} while drawing
    this.view = localStorage.getItem("view") || "auto"; // auto|1|2|3|single
    this.singleCam = localStorage.getItem("singleCam") || null;
    if (this.view === "single" && !this.singleCam) this.view = "auto";
    this.init();
  }

  async init() {
    try {
      const res = await fetch("/cameras");
      const data = await res.json();
      for (const cam of data.cameras || []) this.addCamera(cam);
    } catch (e) { this.log(`failed to list cameras: ${e}`); }
    this.buildToolbar();
    this.applyView();
    this.loadZones();
    this.connectWebSocket();
    setInterval(() => this.pollSystemStats(), 5000);
    setInterval(() => this.updateSessionPanel(), 2000);
    this.pollHistory();
    setInterval(() => this.pollHistory(), 10000);
    document.addEventListener("keydown", (ev) => {
      if (this.editZones && this.draft) {
        if (ev.key === "Escape") {
          const id = this.draft.camId;
          this.draft = null;
          this.redrawOverlay(id);
          return;
        }
        if (ev.key === "Backspace") {
          this.draft.points.pop();
          this.redrawOverlay(this.draft.camId);
          ev.preventDefault();
          return;
        }
        if (ev.key === "Enter") { this.zoneClose(this.draft.camId); return; }
      }
      if (ev.key === "Escape" && this.view === "single") this.setView("auto");
    });
  }

  // ---- layout ----------------------------------------------------------
  buildToolbar() {
    const bar = document.getElementById("layouts");
    const mk = (label, view, title) => {
      const b = document.createElement("button");
      b.textContent = label; b.title = title; b.dataset.view = view;
      b.onclick = () => this.setView(view);
      bar.appendChild(b);
    };
    mk("auto", "auto", "responsive grid");
    mk("1", "1", "one column");
    mk("2", "2", "2-wide grid");
    mk("3", "3", "3-wide grid");
    const zb = document.createElement("button");
    zb.textContent = "✎ zones";
    zb.id = "zone-edit-btn";
    zb.title = "zone editor: click to add points, double-click to close, " +
      "Backspace undoes, Esc cancels";
    zb.onclick = () => this.toggleZoneEdit();
    bar.appendChild(zb);
  }

  // ---- zone editor ------------------------------------------------------
  toggleZoneEdit() {
    this.editZones = !this.editZones;
    this.draft = null;
    document.getElementById("zone-edit-btn")
      .classList.toggle("active", this.editZones);
    for (const [id, cam] of this.cameras) {
      cam.clearBtn.style.display = this.editZones ? "" : "none";
      this.redrawOverlay(id);
    }
    if (this.editZones) {
      this.log("zone editor ON: click a feed to add vertices, " +
               "double-click to close the polygon");
    }
  }

  frameCoords(cam, ev) {
    const rect = cam.img.getBoundingClientRect();
    const fw = cam.canvas.width || cam.img.naturalWidth || rect.width;
    const fh = cam.canvas.height || cam.img.naturalHeight || rect.height;
    if (!cam.canvas.width && fw && fh) {
      cam.canvas.width = fw; cam.canvas.height = fh;
    }
    return [Math.round((ev.clientX - rect.left) / rect.width * fw),
            Math.round((ev.clientY - rect.top) / rect.height * fh)];
  }

  zoneClick(camId, ev) {
    const cam = this.cameras.get(camId);
    if (!cam) return;
    if (!this.draft || this.draft.camId !== camId) {
      this.draft = { camId, points: [] };
    }
    this.draft.points.push(this.frameCoords(cam, ev));
    this.redrawOverlay(camId);
  }

  async zoneClose(camId) {
    if (!this.draft || this.draft.camId !== camId) return;
    const pts = this.draft.points;
    if (pts.length < 3) { this.log("zone needs ≥ 3 points"); return; }
    const name = prompt("zone name:", `zone${
      (this.zones.get(camId) || []).length + 1}`);
    this.draft = null;
    if (name === null) { this.redrawOverlay(camId); return; }
    const zones = (this.zones.get(camId) || [])
      .concat([{ name: name || "zone", points: pts }]);
    await this.postZones(camId, zones);
  }

  async clearZones(camId) {
    this.draft = null;
    await this.postZones(camId, []);
  }

  async postZones(camId, zones) {
    try {
      const res = await fetch("/api/zones", {
        method: "POST",
        headers: { "Content-Type": "application/json" },
        body: JSON.stringify({ camera_id: camId, zones }),
      });
      const data = await res.json();
      if (!data.success) { this.log(`zone update failed: ${this.esc(data.error)}`); return; }
      this.zones.set(camId, data.zones || []);
      this.redrawOverlay(camId);
      this.log(`zones updated for ${this.esc(camId)} (${(data.zones || []).length}); ` +
               `session-only — persist in config.yaml:`);
      const yaml = (data.zones || []).map((z) =>
        `    - name: "${this.esc(z.name)}"\n      camera_id: "${this.esc(camId)}"\n` +
        `      points: ${JSON.stringify(z.points)}`).join("\n");
      if (yaml) this.log(`<span class="muted">collision_detection:\n  ` +
                         `enabled: true\n  zones:\n${yaml}</span>`);
    } catch (e) { this.log(`zone update failed: ${e}`); }
  }

  redrawOverlay(camId) {
    const cam = this.cameras.get(camId);
    if (!cam || !cam.canvas.width) return;
    const ctx = cam.ctx;
    ctx.clearRect(0, 0, cam.canvas.width, cam.canvas.height);
    this.drawZones(cam, camId);
    this.drawDraft(cam, camId);
  }

  // In-progress editor polygon; called from EVERY overlay render path so
  // detection messages and the 2s auto-clear cannot erase the draft.
  drawDraft(cam, camId) {
    if (!this.draft || this.draft.camId !== camId) return;
    const ctx = cam.ctx;
    const pts = this.draft.points;
    ctx.strokeStyle = "#58a6ff";
    ctx.fillStyle = "#58a6ff";
    ctx.lineWidth = 2;
    if (pts.length > 1) {
      ctx.beginPath();
      ctx.moveTo(pts[0][0], pts[0][1]);
      for (const [x, y] of pts.slice(1)) ctx.lineTo(x, y);
      ctx.stroke();
    }
    for (const [x, y] of pts) {
      ctx.beginPath(); ctx.arc(x, y, 4, 0, Math.PI * 2); ctx.fill();
    }
  }

  setView(view, camId = null) {
    this.view = view;
    this.singleCam = camId;
    localStorage.setItem("view", view);
    if (camId) localStorage.setItem("singleCam", camId);
    else localStorage.removeItem("singleCam");
    this.applyView();
  }

  applyView() {
    const main = document.getElementById("cameras");
    const cols = { "1": "1fr", "2": "repeat(2, 1fr)", "3": "repeat(3, 1fr)" };
    main.style.gridTemplateColumns = this.view === "single"
      ? "1fr" : (cols[this.view] ||
                 "repeat(auto-fit, minmax(420px, 1fr))");
    for (const [id, cam] of this.cameras) {
      cam.el.style.display =
        (this.view === "single" && id !== this.singleCam) ? "none" : "";
    }
    for (const b of document.querySelectorAll("#layouts button")) {
      b.classList.toggle("active", b.dataset.view === this.view);
    }
  }

  addCamera(cam) {
    const root = document.getElementById("cameras");
    const div = document.createElement("div");
    div.className = "cam";
    // no id/name interpolation into markup: ids/names are server-sourced
    // strings and must never reach innerHTML raw (attribute injection)
    div.innerHTML = `
      <div class="head">
        <span class="name"></span>
        <button class="zone-clear" style="display:none"
                title="remove all zones">clear zones</button>
        <span class="badge fps">— fps</span>
        <span class="badge state">—</span>
      </div>
      <div class="view">
        <img>
        <canvas></canvas>
      </div>`;
    root.appendChild(div);
    div.querySelector(".name").textContent = cam.name || cam.id;
    const img = div.querySelector("img");
    img.src = `/video/feed/${encodeURIComponent(cam.id)}`;
    img.alt = cam.id;
    const canvas = div.querySelector("canvas");
    const view = div.querySelector(".view");
    view.onclick = (ev) => {
      if (this.editZones) { this.zoneClick(cam.id, ev); return; }
      this.setView(this.view === "single" ? "auto" : "single",
                   this.view === "single" ? null : cam.id);
    };
    view.ondblclick = (ev) => {
      if (this.editZones) { ev.preventDefault(); this.zoneClose(cam.id); }
    };
    const clearBtn = div.querySelector(".zone-clear");
    clearBtn.onclick = (ev) => {
      ev.stopPropagation(); this.clearZones(cam.id);
    };
    this.cameras.set(cam.id, {
      el: div, img, canvas, ctx: canvas.getContext("2d"),
      badge: div.querySelector(".badge.state"),
      fpsBadge: div.querySelector(".badge.fps"),
      clearBtn,
      lastSeen: 0,
    });
  }

  async loadZones() {
    // live zones (config + any session edits) from the server
    try {
      const res = await fetch("/api/zones");
      if (res.ok) {
        const data = await res.json();
        let any = false;
        for (const [cam, zones] of Object.entries(data.zones || {})) {
          if (zones.length) { this.zones.set(cam, zones); any = true; }
        }
        if (any) return;
      }
    } catch { /* fall back to config */ }
    try {
      const res = await fetch("/api/config/current");
      const cfg = await res.json();
      const cc = cfg.collision_detection || {};
      if (!cc.enabled) return;
      for (const zone of cc.zones || []) {
        const cams = zone.camera_id ? [zone.camera_id]
          : [...this.cameras.keys()];
        for (const cam of cams) {
          if (!this.zones.has(cam)) this.zones.set(cam, []);
          this.zones.get(cam).push(zone);
        }
      }
    } catch { /* zones are optional */ }
  }

  drawZones(cam, camId) {
    const ctx = cam.ctx;
    for (const zone of this.zones.get(camId) || []) {
      const pts = zone.points || [];
      if (pts.length < 3) continue;
      ctx.beginPath();
      ctx.moveTo(pts[0][0], pts[0][1]);
      for (const [x, y] of pts.slice(1)) ctx.lineTo(x, y);
      ctx.closePath();
      ctx.fillStyle = "rgba(255, 160, 60, .12)";
      ctx.fill();
      ctx.strokeStyle = "rgba(255, 160, 60, .8)";
      ctx.lineWidth = 2;
      ctx.stroke();
      ctx.fillStyle = "rgba(255, 160, 60, .9)";
      ctx.fillText(zone.name || "zone", pts[0][0] + 4, pts[0][1] + 16);
    }
  }

  // ---- websocket ---------------------------------------------------------
  connectWebSocket() {
    const proto = location.protocol === "https:" ? "wss" : "ws";
    this.ws = new WebSocket(`${proto}://${location.host}/ws/detections`);
    const conn = document.getElementById("conn");
    this.ws.onopen = () => {
      conn.textContent = "live"; conn.classList.add("ok");
      this.wsRetryMs = 1000;
    };
    this.ws.onclose = () => {
      conn.textContent = "disconnected"; conn.classList.remove("ok");
      setTimeout(() => this.connectWebSocket(),
                 this.wsRetryMs = Math.min(this.wsRetryMs * 2, 15000));
    };
    this.ws.onmessage = (ev) => {
      let msg; try { msg = JSON.parse(ev.data); } catch { return; }
      this.msgTimes.push(Date.now());
      if (this.msgTimes.length > 300) this.msgTimes.shift();
      if (msg.type === "detections") this.onDetections(msg);
      else if (msg.type === "status") this.onStatus(msg);
    };
  }

  onDetections(msg) {
    const cam = this.cameras.get(msg.camera_id);
    const dets = msg.detections || [];
    this.sessionDetections += dets.length;
    if (cam) {
      cam.lastSeen = Date.now();
      cam.badge.textContent =
        `${dets.length} det · ${Math.round(msg.total_latency_ms || 0)} ms`;
      this.drawDetections(cam, msg);
    }
    for (const alert of msg.collision_alerts || []) {
      this.log(`<span class="alert">⚠ ${this.esc(msg.camera_id)}: ${this.esc(alert.class_name)} ` +
               `${this.esc(alert.risk)} at zone "${this.esc(alert.zone)}" ` +
               `(${alert.distance_px}px${alert.predicted ? ", predicted" : ""})` +
               `</span>`);
    }
    for (const d of dets) {
      const key = d.species || d.class_name || "?";
      this.sessionByClass.set(key, (this.sessionByClass.get(key) || 0) + 1);
      const label = d.species
        ? `${d.species} (${Math.round((d.species_confidence || 0) * 100)}%)`
        : `${d.class_name} (${Math.round((d.confidence || 0) * 100)}%)`;
      this.log(`<span class="det">${this.esc(msg.camera_id)}: ${this.esc(label)}</span>`);
    }
  }

  drawDetections(cam, msg) {
    const [h, w] = msg.frame_shape || [cam.img.naturalHeight, cam.img.naturalWidth];
    cam.canvas.width = w; cam.canvas.height = h;
    const ctx = cam.ctx;
    ctx.clearRect(0, 0, w, h);
    this.drawZones(cam, msg.camera_id);
    this.drawDraft(cam, msg.camera_id);
    ctx.lineWidth = Math.max(2, w / 640);
    ctx.font = `${Math.max(14, w / 55)}px system-ui`;
    for (const d of msg.detections || []) {
      const b = d.bbox;
      ctx.strokeStyle = d.class_name === "person" ? "#ff5252" : "#7ee787";
      ctx.strokeRect(b.x1, b.y1, b.x2 - b.x1, b.y2 - b.y1);
      let label = d.species || d.class_name;
      if (d.track_id != null) label = `#${d.track_id} ${label}`;
      ctx.fillStyle = "rgba(0,0,0,.65)";
      const tw = ctx.measureText(label).width + 8;
      ctx.fillRect(b.x1, Math.max(b.y1 - 22, 0), tw, 22);
      ctx.fillStyle = "#fff";
      ctx.fillText(label, b.x1 + 4, Math.max(b.y1 - 6, 14));
    }
    // overlays auto-clear if nothing arrives for 2s (zones stay)
    clearTimeout(cam.clearTimer);
    cam.clearTimer = setTimeout(() => {
      ctx.clearRect(0, 0, w, h);
      this.drawZones(cam, msg.camera_id);
      this.drawDraft(cam, msg.camera_id);
    }, 2000);
  }

  onStatus(msg) {
    for (const cam of msg.cameras || []) {
      const c = this.cameras.get(cam.id);
      if (!c) continue;
      c.fpsBadge.textContent = `${(cam.fps || 0).toFixed(1)} fps`;
      c.fpsBadge.classList.toggle("bad", !cam.connected);
      if (Date.now() - c.lastSeen > 5000) {
        c.badge.textContent = cam.connected ? "idle" : "offline";
      }
    }
  }

  // ---- stats -------------------------------------------------------------
  async pollSystemStats() {
    try {
      const res = await fetch("/api/system/stats");
      const s = await res.json();
      document.getElementById("stats-bar").textContent =
        `agg ${s.aggregate_fps} fps · up ${Math.round(s.uptime_seconds)}s`;
      const frac = s.device_memory ? (s.device_memory.memory_fraction || 0) : 0;
      const gauge = document.getElementById("hbm-fill");
      gauge.style.width = `${Math.round(frac * 100)}%`;
      gauge.classList.toggle("warn", frac > 0.75);
      gauge.classList.toggle("crit", frac > 0.9);
      document.getElementById("hbm-label").textContent =
        s.device_memory ? `HBM ${Math.round(frac * 100)}%` : "HBM n/a";
      // REC badge while a post-trigger clip is held open for a camera
      const recording = new Set(s.clips_recording || []);
      for (const [camId, cam] of this.cameras) {
        cam.badge.classList.toggle("rec", recording.has(camId));
      }
    } catch { /* server away; WS reconnect handles it */ }
  }

  // Historical charts: sparklines over /api/system/stats/history samples
  // (reference has no history endpoint; its gauge shows instants only).
  async pollHistory() {
    let hist;
    try {
      const res = await fetch("/api/system/stats/history?minutes=15");
      hist = await res.json();
    } catch { return; }
    const samples = hist.samples || [];
    if (!samples.length) return;
    const last = samples[samples.length - 1];
    this.sparkline("hist-fps", samples.map((s) => s.fps), "#58a6ff");
    document.getElementById("hist-fps-label").textContent =
      `capture fps (now ${(last.fps ?? 0).toFixed(1)})`;
    const hbm = samples.map((s) => (s.hbm_frac ?? 0) * 100);
    this.sparkline("hist-hbm", hbm, "#7ee787", 100);
    document.getElementById("hist-hbm-label").textContent =
      last.hbm_frac != null
        ? `HBM % (now ${Math.round(last.hbm_frac * 100)}%)` : "HBM n/a";
    this.sparkline("hist-lat", samples.map((s) => s.infer_ms ?? 0), "#ffa657");
    document.getElementById("hist-lat-label").textContent =
      last.infer_ms != null
        ? `inference ms (now ${last.infer_ms.toFixed(1)})` : "inference n/a";
  }

  sparkline(id, values, color, fixedMax = null) {
    const canvas = document.getElementById(id);
    if (!canvas || !values.length) return;
    const ctx = canvas.getContext("2d");
    const w = canvas.width, h = canvas.height, pad = 3;
    ctx.clearRect(0, 0, w, h);
    const max = fixedMax ?? Math.max(...values, 1e-6);
    const min = fixedMax != null ? 0 : Math.min(...values, 0);
    const span = max - min || 1;
    const x = (i) => pad + (i / Math.max(values.length - 1, 1)) * (w - 2 * pad);
    const y = (v) => h - pad - ((v - min) / span) * (h - 2 * pad);
    ctx.beginPath();
    ctx.moveTo(x(0), y(values[0]));
    for (let i = 1; i < values.length; i++) ctx.lineTo(x(i), y(values[i]));
    ctx.strokeStyle = color;
    ctx.lineWidth = 1.5;
    ctx.stroke();
    ctx.lineTo(x(values.length - 1), h - pad);
    ctx.lineTo(x(0), h - pad);
    ctx.closePath();
    ctx.fillStyle = color + "22";
    ctx.fill();
  }

  updateSessionPanel() {
    const now = Date.now();
    const recent = this.msgTimes.filter((t) => now - t < 10000).length / 10;
    const top = [...this.sessionByClass.entries()]
      .sort((a, b) => b[1] - a[1]).slice(0, 6)
      .map(([k, v]) => `${k}: ${v}`).join(" · ") || "none yet";
    document.getElementById("session-panel").innerHTML =
      `<b>session</b> ${this.sessionDetections} detections · ` +
      `${recent.toFixed(1)} msg/s<br><span class="muted">${top}</span>`;
  }

  esc(s) {
    return String(s).replace(/[&<>"']/g, (c) => ({
      "&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "'": "&#39;",
    }[c]));
  }

  log(html) {
    const el = document.getElementById("log");
    const line = document.createElement("div");
    line.innerHTML = `${new Date().toLocaleTimeString()} ${html}`;
    el.prepend(line);
    while (el.childElementCount > 200) el.lastChild.remove();
  }
}

window.app = new DetectionApp();
