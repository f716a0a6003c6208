"""Single-page GUI app (inline HTML/JS, no build step)."""

APP_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>WhisperJAV TPU</title>
<style>
  :root { color-scheme: dark; }
  body { font-family: system-ui, sans-serif; margin: 0; background: #14161a;
         color: #e8e8e8; }
  header { padding: 14px 22px; background: #1d2026;
           border-bottom: 1px solid #2c313a; }
  h1 { font-size: 17px; margin: 0; font-weight: 600; }
  main { display: grid; grid-template-columns: 360px 1fr; gap: 18px;
         padding: 18px 22px; }
  .panel { background: #1d2026; border: 1px solid #2c313a;
           border-radius: 8px; padding: 16px; }
  label { display: block; font-size: 12px; color: #9aa4b2;
          margin: 10px 0 3px; }
  input, select { width: 100%; box-sizing: border-box; padding: 6px 8px;
                  background: #14161a; color: #e8e8e8;
                  border: 1px solid #2c313a; border-radius: 5px; }
  .row { display: flex; gap: 10px; }
  .row > div { flex: 1; }
  button { margin-top: 14px; padding: 8px 18px; border-radius: 6px;
           border: none; cursor: pointer; font-weight: 600; }
  #start { background: #3b82f6; color: white; }
  #cancel { background: #3a3f48; color: #e8e8e8; }
  #logs { font-family: ui-monospace, monospace; font-size: 12px;
          white-space: pre-wrap; background: #101214; border-radius: 6px;
          padding: 12px; height: 70vh; overflow-y: auto; }
  #status { font-size: 12px; color: #9aa4b2; margin-left: 10px; }
  .chk { display: flex; align-items: center; gap: 6px; margin-top: 8px;
         font-size: 13px; }
  .chk input { width: auto; }
</style>
</head>
<body>
<header><h1>WhisperJAV <span style="color:#3b82f6">TPU</span>
  <span id="status"></span></h1></header>
<main>
  <div class="panel">
    <label>Input files / directory / glob</label>
    <input id="inputs" placeholder="/data/videos or /data/*.wav">
    <label>Output directory</label>
    <input id="output_dir" value="./output">
    <div class="row">
      <div><label>Mode</label><select id="mode"></select></div>
      <div><label>Sensitivity</label><select id="sensitivity"></select></div>
    </div>
    <div class="row">
      <div><label>VAD</label><select id="vad_backend"></select></div>
      <div><label>Scenes</label><select id="scene_backend"></select></div>
    </div>
    <div class="row">
      <div><label>Enhancer</label><select id="enhancer"></select></div>
      <div><label>Subs language</label>
        <select id="subs_language">
          <option value="japanese">japanese</option>
          <option value="english-direct">english-direct</option>
        </select></div>
    </div>
    <label>Model checkpoint (local dir, optional)</label>
    <input id="checkpoint" placeholder="/models/whisper-large-v2">
    <div class="row">
      <div><label>Translate provider</label>
        <select id="translate"></select></div>
      <div><label>Batch size</label>
        <input id="batch_size" type="number" value="8"></div>
    </div>
    <div class="chk"><input type="checkbox" id="ensemble">
      <span>Two-pass ensemble</span></div>
    <div class="chk"><input type="checkbox" id="skip_existing" checked>
      <span>Skip existing outputs</span></div>
    <div class="chk"><input type="checkbox" id="make_vtt">
      <span>Also write VTT</span></div>
    <label>Preset</label>
    <div class="row">
      <div><select id="preset"><option value="">(none)</option></select></div>
      <div><input id="preset_name" placeholder="save as…"></div>
    </div>
    <div class="row">
      <div><button id="save_preset" style="background:#3a3f48;color:#e8e8e8">
        Save preset</button></div>
      <div><button id="delete_preset" style="background:#3a3f48;color:#e8e8e8">
        Delete</button></div>
    </div>
    <button id="start">Start</button>
    <button id="cancel">Cancel</button>
  </div>
  <div class="panel"><div id="logs">ready.</div></div>
</main>
<script>
const $ = id => document.getElementById(id);
let next = 0, polling = null;

async function loadSchema() {
  const s = await (await fetch('/api/schema')).json();
  const fill = (id, items, labels) => {
    const sel = $(id); sel.innerHTML = '';
    for (const v of items) {
      const o = document.createElement('option');
      o.value = v; o.textContent = labels && labels[v] ? v + ' — ' + labels[v] : (v || '(none)');
      sel.appendChild(o);
    }
  };
  fill('mode', Object.keys(s.modes));
  $('mode').value = 'balanced';
  fill('sensitivity', s.sensitivities); $('sensitivity').value = 'balanced';
  fill('vad_backend', [''].concat(s.vad_backends));
  fill('scene_backend', [''].concat(s.scene_backends));
  fill('enhancer', [''].concat(s.enhancers));
  fill('translate', s.translate_providers);
}

function options() {
  const o = { inputs: $('inputs').value.trim() };
  for (const k of ['output_dir','mode','sensitivity','vad_backend',
                   'scene_backend','enhancer','subs_language','checkpoint',
                   'translate','batch_size'])
    if ($(k).value) o[k] = $(k).value;
  for (const k of ['ensemble','skip_existing','make_vtt'])
    o[k] = $(k).checked;
  return o;
}

async function poll() {
  const r = await (await fetch('/api/logs?since=' + next)).json();
  if (r.lines.length) {
    if (next === 0) $('logs').textContent = '';
    $('logs').textContent += r.lines.join('\\n') + '\\n';
    $('logs').scrollTop = $('logs').scrollHeight;
  }
  next = r.next;
  $('status').textContent = '· ' + r.status;
  if (r.status === 'running') polling = setTimeout(poll, 700);
}

$('start').onclick = async () => {
  if (!$('inputs').value.trim()) { alert('enter an input path'); return; }
  next = 0; clearTimeout(polling);
  const r = await (await fetch('/api/start', { method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify(options()) })).json();
  if (!r.ok) { alert(r.error); return; }
  poll();
};
$('cancel').onclick = () => fetch('/api/cancel', { method: 'POST' });

async function loadPresets() {
  const ps = await (await fetch('/api/presets')).json();
  const sel = $('preset'); sel.innerHTML = '<option value="">(none)</option>';
  for (const name of Object.keys(ps)) {
    const o = document.createElement('option');
    o.value = name; o.textContent = name;
    sel.appendChild(o);
  }
  sel.onchange = () => {
    const p = ps[sel.value];
    if (!p) return;
    for (const [k, v] of Object.entries(p)) {
      const el = $(k);
      if (!el) continue;
      if (el.type === 'checkbox') el.checked = !!v;
      else el.value = v;
    }
  };
}
$('save_preset').onclick = async () => {
  const name = $('preset_name').value.trim();
  if (!name) { alert('enter a preset name'); return; }
  const r = await (await fetch('/api/presets', { method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({ name, options: options() }) })).json();
  if (!r.ok) { alert(r.error); return; }
  loadPresets();
};
$('delete_preset').onclick = async () => {
  const name = $('preset').value;
  if (!name) return;
  await fetch('/api/presets', { method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({ name, delete: true }) });
  loadPresets();
};

loadSchema();
loadPresets();
</script>
</body>
</html>
"""
