// Diff cross-validation harness: run the reference bundle's transform +
// transformDiffPlugin over JSON [[newHtml, oldHtml], ...] pairs from stdin,
// print one JSON result per pair (the ACTUAL behavior oracle for
// html_parser_spark/core/diff.py). Parse order matches the reference specs:
// old first, new second, then transform(newAst, {diffAst: oldAst}).
import { HTMLParser, transform } from '/root/reference/demo/core/index.js';
import { transformDiffPlugin } from '/root/reference/demo/transform/index.js';

const chunks = [];
process.stdin.on('data', (c) => chunks.push(c));
process.stdin.on('end', () => {
  const cases = JSON.parse(Buffer.concat(chunks).toString('utf8'));
  const parser = new HTMLParser();
  const out = [];
  for (const [newHtml, oldHtml] of cases) {
    try {
      const oldAst = parser.parser(oldHtml);
      const newAst = parser.parser(newHtml);
      const html = transform(newAst, {
        diffAst: oldAst,
        nodeTransforms: [['all', transformDiffPlugin()]],
      });
      out.push({ status: 'ok', html });
    } catch (e) {
      out.push({ status: 'throw', error_type: e.constructor.name, message: String(e.message) });
    }
  }
  process.stdout.write(JSON.stringify(out));
});
