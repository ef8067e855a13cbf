// Single-pair diff harness: ONE pair per process. The transform bundle has
// its own esbuild-duplicated CONFIG (wrapper-id counter starting at 1, never
// reset), so batch runs are call-history-dependent; a fresh process pins the
// counter at 1 and gives a reproducible per-pair oracle for the bundle's
// behavior (our port reproduces it with idx_start=1).
// argv[1] = JSON [newHtml, oldHtml]; prints JSON result.
import { HTMLParser, transform } from '/root/reference/demo/core/index.js';
import { transformDiffPlugin } from '/root/reference/demo/transform/index.js';

const [newHtml, oldHtml] = JSON.parse(process.argv[2]);
const parser = new HTMLParser();
try {
  const oldAst = parser.parser(oldHtml);
  const newAst = parser.parser(newHtml);
  const html = transform(newAst, {
    diffAst: oldAst,
    nodeTransforms: [['all', transformDiffPlugin()]],
  });
  process.stdout.write(JSON.stringify({ status: 'ok', html }));
} catch (e) {
  process.stdout.write(
    JSON.stringify({ status: 'throw', error_type: e.constructor.name, message: String(e.message) })
  );
}
