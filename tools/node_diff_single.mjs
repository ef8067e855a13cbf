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
  // dump diffAttributes annotations (DFS pre-order over the final new tree)
  // so core/diff.collect_diff_attributes can be golden-tested. transform()
  // deepCopies the AST and discards the annotated copy after generate, so
  // the annotation is only observable by invoking the plugin DIRECTLY on
  // freshly parsed trees (the same call shape transform_diff models; node
  // ids restart per parse, so the dump is independent of the transform()
  // call above). JSON drops undefined attr values (the quoted-empty quirk)
  // — readers treat a missing 'value' key as null.
  let diffAttrs = null;
  try {
    const oldAst2 = parser.parser(oldHtml);
    const newAst2 = parser.parser(newHtml);
    transformDiffPlugin()(newAst2, { diffAst: oldAst2 });
    diffAttrs = [];
    (function walk(n) {
      if (n.diffAttributes) diffAttrs.push([Number(n.id), n.diffAttributes]);
      for (const c of n.children || []) walk(c);
    })(newAst2);
  } catch (e) {
    diffAttrs = null; // in-diff TypeError: annotation dump unavailable
  }
  // node ids are BigInt in the bundle — coerce for JSON
  process.stdout.write(
    JSON.stringify({ status: 'ok', html, diffAttrs }, (k, v) =>
      typeof v === 'bigint' ? Number(v) : v
    )
  );
} catch (e) {
  process.stdout.write(
    JSON.stringify({ status: 'throw', error_type: e.constructor.name, message: String(e.message) })
  );
}
