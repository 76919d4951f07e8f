package graft.server

/** Minimal self-contained web UI for the HTTP API (parity with the
  * reference's upload/paste page: POST to /process, render the types map as
  * schema cards and the data as a table, client-side CSV export — SURVEY
  * §2.1 S10). Authored from scratch; served at GET /.
  */
object WebUi {
  val html: String =
    """<!doctype html>
      |<html><head><meta charset="utf-8"><title>graft ETL</title>
      |<style>
      |  body { font-family: system-ui, sans-serif; margin: 2rem; max-width: 960px; }
      |  textarea { width: 100%; height: 10rem; font-family: monospace; }
      |  .cards { display: flex; flex-wrap: wrap; gap: .5rem; margin: 1rem 0; }
      |  .card { border: 1px solid #ccc; border-radius: 6px; padding: .4rem .7rem; }
      |  .card b { display: block; }
      |  table { border-collapse: collapse; margin-top: 1rem; }
      |  td, th { border: 1px solid #ddd; padding: .25rem .5rem; font-size: .85rem; }
      |  button { margin: .5rem .5rem .5rem 0; padding: .4rem 1rem; }
      |</style></head>
      |<body>
      |<h1>graft ETL</h1>
      |<p>Paste mixed content (HTML + JSON + text + base64) and process it.</p>
      |<textarea id="in" placeholder='{"example": 1} plus any text...'></textarea><br>
      |<button onclick="run()">Process</button>
      |<button onclick="exportCsv()" id="exp" disabled>Export CSV</button>
      |<div id="schema" class="cards"></div>
      |<div id="out"></div>
      |<script>
      |let rows = [], cols = [];
      |async function run() {
      |  // reset previous results so a failed run can't leave stale state
      |  rows = []; cols = [];
      |  document.getElementById('schema').innerHTML = '';
      |  document.getElementById('out').innerHTML = '';
      |  document.getElementById('exp').disabled = true;
      |  let j;
      |  try {
      |    const r = await fetch('/process', {method: 'POST',
      |      headers: {'Content-Type': 'text/plain'},
      |      body: document.getElementById('in').value});
      |    j = await r.json();
      |  } catch (e) {
      |    document.getElementById('out').textContent = 'request failed: ' + e;
      |    return;
      |  }
      |  if (!j.success) { document.getElementById('out').textContent = JSON.stringify(j); return; }
      |  rows = j.data;
      |  // rows arrive in the server's canonical column order (core first,
      |  // then alphabetical) — use it rather than re-deriving
      |  cols = rows.length ? Object.keys(rows[0]) : Object.keys(j.types);
      |  document.getElementById('schema').innerHTML = Object.entries(j.types)
      |    .map(([k, t]) => `<div class="card"><b>${esc(k)}</b>${esc(t)}</div>`).join('');
      |  document.getElementById('out').innerHTML = '<table><tr>' +
      |    cols.map(c => `<th>${esc(c)}</th>`).join('') + '</tr>' +
      |    rows.map(r2 => '<tr>' + cols.map(c =>
      |      `<td>${esc(cell(r2[c]))}</td>`).join('') + '</tr>').join('') + '</table>';
      |  document.getElementById('exp').disabled = rows.length === 0;
      |}
      |function cell(v) {
      |  if (v === null || v === undefined) return '';
      |  const s = Array.isArray(v) ? JSON.stringify(v) : String(v);
      |  return s.length > 50 ? s.slice(0, 50) + '…' : s;
      |}
      |function esc(s) { const d = document.createElement('div');
      |  d.textContent = s; return d.innerHTML; }
      |function exportCsv() {
      |  const q = v => { if (v === null || v === undefined) return '';
      |    const s = Array.isArray(v) ? JSON.stringify(v) : String(v);
      |    return /[",\r\n]/.test(s) ? '"' + s.replace(/"/g, '""') + '"' : s; };
      |  const csv = [cols.map(q).join(',')]
      |    .concat(rows.map(r2 => cols.map(c => q(r2[c])).join(','))).join('\n');
      |  const a = document.createElement('a');
      |  a.href = URL.createObjectURL(new Blob([csv], {type: 'text/csv'}));
      |  a.download = 'cleaned_output.csv';
      |  a.click();
      |}
      |</script>
      |</body></html>
      |""".stripMargin
}
