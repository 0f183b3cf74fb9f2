/* Detection dashboard: WebSocket detections -> canvas overlays on MJPEG
 * feeds, per-camera badges, session stats. Counterpart of the reference's
 * web/app.js DetectionApp (WS client :423, overlay renderer :632, MJPEG
 * feeds :571), reimplemented compactly. */
"use strict";

class DetectionApp {
  constructor() {
    this.cameras = new Map();        // id -> {el, canvas, ctx, badge, lastSeen}
    this.sessionDetections = 0;
    this.ws = null;
    this.wsRetryMs = 1000;
    this.init();
  }

  async init() {
    try {
      const res = await fetch("/cameras");
      const data = await res.json();
      for (const cam of data.cameras || []) this.addCamera(cam);
    } catch (e) { this.log(`failed to list cameras: ${e}`); }
    this.connectWebSocket();
    setInterval(() => this.pollSystemStats(), 5000);
  }

  addCamera(cam) {
    const root = document.getElementById("cameras");
    const div = document.createElement("div");
    div.className = "cam";
    div.innerHTML = `
      <div class="head">
        <span>${cam.name || cam.id}</span>
        <span class="badge" id="badge-${cam.id}">—</span>
      </div>
      <div class="view">
        <img src="/video/feed/${cam.id}" alt="${cam.id}">
        <canvas></canvas>
      </div>`;
    root.appendChild(div);
    const img = div.querySelector("img");
    const canvas = div.querySelector("canvas");
    this.cameras.set(cam.id, {
      el: div, img, canvas, ctx: canvas.getContext("2d"),
      badge: div.querySelector(`#badge-${CSS.escape(cam.id)}`),
      lastSeen: 0,
    });
  }

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
    for (const d of dets) {
      const label = d.species
        ? `${d.species} (${Math.round((d.species_confidence || 0) * 100)}%)`
        : `${d.class_name} (${Math.round((d.confidence || 0) * 100)}%)`;
      this.log(`<span class="det">${msg.camera_id}: ${label}</span>`);
    }
  }

  drawDetections(cam, msg) {
    const [h, w] = msg.frame_shape || [cam.img.naturalHeight, cam.img.naturalWidth];
    cam.canvas.width = w; cam.canvas.height = h;
    const ctx = cam.ctx;
    ctx.clearRect(0, 0, w, h);
    ctx.lineWidth = Math.max(2, w / 640);
    ctx.font = `${Math.max(14, w / 55)}px system-ui`;
    for (const d of msg.detections || []) {
      const b = d.bbox;
      ctx.strokeStyle = d.class_name === "person" ? "#ff5252" : "#7ee787";
      ctx.strokeRect(b.x1, b.y1, b.x2 - b.x1, b.y2 - b.y1);
      const label = d.species || d.class_name;
      ctx.fillStyle = "rgba(0,0,0,.65)";
      const tw = ctx.measureText(label).width + 8;
      ctx.fillRect(b.x1, Math.max(b.y1 - 22, 0), tw, 22);
      ctx.fillStyle = "#fff";
      ctx.fillText(label, b.x1 + 4, Math.max(b.y1 - 6, 14));
    }
    // overlays auto-clear if nothing arrives for 2s
    clearTimeout(cam.clearTimer);
    cam.clearTimer = setTimeout(() => ctx.clearRect(0, 0, w, h), 2000);
  }

  onStatus(msg) {
    for (const cam of msg.cameras || []) {
      const c = this.cameras.get(cam.id);
      if (c && Date.now() - c.lastSeen > 5000) {
        c.badge.textContent =
          `${cam.connected ? "ok" : "offline"} · ${(cam.fps || 0).toFixed(1)} fps`;
      }
    }
  }

  async pollSystemStats() {
    try {
      const res = await fetch("/api/system/stats");
      const s = await res.json();
      const mem = s.device_memory
        ? ` · HBM ${Math.round((s.device_memory.memory_fraction || 0) * 100)}%`
        : "";
      document.getElementById("stats-bar").textContent =
        `agg ${s.aggregate_fps} fps · up ${Math.round(s.uptime_seconds)}s` +
        `${mem} · session dets ${this.sessionDetections}`;
    } catch { /* server away; WS reconnect handles it */ }
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
