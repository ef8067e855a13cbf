// Cross-validation harness: run the reference bundle (read-only, at
// /root/reference/demo/core/index.js) over a JSON list of HTML strings from
// stdin, print one JSON result per case. Used by tests/test_oracle_vs_node.py
// to pin the Python oracle to the reference's ACTUAL behavior.
import { HTMLParser } from '/root/reference/demo/core/index.js';

const chunks = [];
process.stdin.on('data', (c) => chunks.push(c));
process.stdin.on('end', () => {
  const cases = JSON.parse(Buffer.concat(chunks).toString('utf8'));
  const parser = new HTMLParser();
  const out = [];
  for (const html of cases) {
    try {
      const ast = parser.parser(html);
      out.push({ status: 'ok', ast: JSON.parse(JSON.stringify(ast, (k, v) => (typeof v === 'bigint' ? Number(v) : v))) });
    } catch (e) {
      out.push({ status: 'throw', error_type: e.constructor.name, message: e.message });
    }
  }
  process.stdout.write(JSON.stringify(out));
});
