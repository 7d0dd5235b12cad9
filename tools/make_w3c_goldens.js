// Expected-result generator for the W3C-format conformance suite
// (tests/fixtures/w3c_rdfc10): walks manifest.jsonld exactly as the
// reference harness does (/root/reference/test/test.js:312-384 --
// computationalComplexity low/medium/high -> maxWorkFactor 0/2/3,
// hashAlgorithm -> messageDigestAlgorithm) and runs the REFERENCE
// implementation to produce each entry's `result` file:
//   RDFC10EvalTest      -> testNNN-rdfc10.nq       (canonical N-Quads)
//   RDFC10MapTest       -> testNNN-rdfc10map.json  (input -> c14n ids)
//   RDFC10NegativeEvalTest -> asserts the reference THROWS (no file)
// Run after tools/gen_w3c_suite.py; outputs are committed so pytest
// never needs node.
'use strict';
const fs = require('fs');
const path = require('path');
const canonize = require('/root/reference/lib/index.js');

const DIR = path.join(__dirname, '..', 'tests', 'fixtures', 'w3c_rdfc10');
const manifest = JSON.parse(
  fs.readFileSync(path.join(DIR, 'manifest.jsonld'), 'utf8'));

function workFactor(entry) {
  const c = entry.computationalComplexity;
  if(c === 'low') { return 0; }
  if(c === 'medium') { return 2; }
  if(c === 'high') { return 3; }
  return 1; // reference default when unset
}

(async () => {
  let nEval = 0, nMap = 0, nNeg = 0;
  for(const entry of manifest.entries) {
    const input = fs.readFileSync(path.join(DIR, entry.action), 'utf8');
    const opts = {
      algorithm: 'RDFC-1.0',
      inputFormat: 'application/n-quads',
      maxWorkFactor: workFactor(entry)
    };
    if(entry.hashAlgorithm) {
      opts.messageDigestAlgorithm = entry.hashAlgorithm;
    }
    const type = entry['@type'];
    if(type === 'rdfc:RDFC10NegativeEvalTest') {
      let threw = null;
      try {
        await canonize.canonize(input, opts);
      } catch(e) {
        threw = e.message;
      }
      if(threw === null) {
        throw new Error(
          `${entry['@id']}: reference did NOT throw at ` +
          `maxWorkFactor=${opts.maxWorkFactor} -- fix the case`);
      }
      nNeg++;
      continue;
    }
    const canonicalIdMap = new Map();
    opts.canonicalIdMap = canonicalIdMap;
    const output = await canonize.canonize(input, opts);
    if(type === 'rdfc:RDFC10EvalTest') {
      fs.writeFileSync(path.join(DIR, entry.result), output);
      nEval++;
    } else if(type === 'rdfc:RDFC10MapTest') {
      fs.writeFileSync(
        path.join(DIR, entry.result),
        JSON.stringify(Object.fromEntries(canonicalIdMap), null, 2) + '\n');
      nMap++;
    } else {
      throw new Error(`unknown test type: ${type}`);
    }
  }
  console.log(`wrote ${nEval} eval + ${nMap} map results; ` +
              `verified ${nNeg} negative cases throw`);
})().catch(e => { console.error(e); process.exit(1); });
