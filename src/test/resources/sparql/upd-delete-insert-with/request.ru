PREFIX : <http://x/>
WITH <http://x/g1>
DELETE { ?s :st :old }
INSERT { ?s :st :new }
WHERE { ?s :st :old }
